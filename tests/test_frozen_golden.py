"""STATIC golden regression: frozen bytes checked into the repo.

The other golden tests derive expectations from the generator at test time —
a coordinated change to generator + extractor would pass them silently.
These fixtures were frozen in round 1 (tests/golden_frozen.json) and pin:

  - html -> text byte-identity on literal stored HTML bytes (the engine's
    per-url invariant, BASELINE.json input_hint), and
  - sentence -> linked-slot extraction on literal stored sentences.

If a deliberate semantic change ever requires regenerating this file, the
diff must be reviewed slot by slot — that is the point.
"""

from __future__ import annotations

import base64
import json
import os

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden_frozen.json")


def _load():
    with open(_GOLDEN, encoding="utf-8") as f:
        return json.load(f)


class TestFrozenGolden:
    def test_html_to_text_bytes(self):
        from calendar_event_entity_extraction_ray.functions.htmltext import (
            html_to_text,
        )

        cases = _load()["html_to_text"]
        assert len(cases) >= 20
        for c in cases:
            html = base64.b64decode(c["html_b64"])
            assert html_to_text(html) == c["text"], f"drift at page {c['i']}"

    def test_extract_and_link(self):
        from calendar_event_entity_extraction_ray.functions.extract import (
            EventGrammar,
        )
        from calendar_event_entity_extraction_ray.functions.linking import (
            EntityLinker,
        )

        g = EventGrammar()
        lk = EntityLinker()
        cases = _load()["extract_and_link"]
        assert len(cases) >= 25
        for c in cases:
            ev = g.extract_sentence(c["sentence"])
            assert ev is not None, c["sentence"]
            if ev.get("attendees"):
                ev["attendees"] = [lk.link(a, "person") for a in ev["attendees"]]
            if ev.get("location") is not None:
                ev["location"] = lk.link(ev["location"], "place")
            assert ev == c["slots"], c["sentence"]
