"""Pure semantic kernels — no Ray imports here.

Everything in this package is deterministic, picklable, and usable both from
the single-process oracle emitter (the pytest / P-R reference) and from inside
Ray Data ``map_batches`` stages.
"""
