"""Ray Data stage wrappers.

Conventions (SURVEY.md §7, ray_guide.md):
  - stateless transforms are plain functions passed to ``map_batches``
    (elastic tasks);
  - stateful transforms are callable CLASSES (actor pools): all setup —
    grammar compilation, alias-dict fetch, index build — happens once per
    actor in ``__init__``, never per batch;
  - batches are ``pyarrow.Table`` (zero-copy) unless a kernel genuinely
    needs pandas/numpy;
  - small lookup sides are broadcast once via ``ray.put`` and fetched in
    actor ``__init__`` — never re-shipped per batch.
"""
