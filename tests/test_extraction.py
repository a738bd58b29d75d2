"""Extraction grammar, html->text invariant, linking, triples, oracle P/R."""

from __future__ import annotations

from calendar_event_entity_extraction_ray.functions.dedup import (
    MinHasher,
    char_ngrams,
    hamming64,
    jaccard,
    simhash64,
    word_shingles,
)
from calendar_event_entity_extraction_ray.functions.extract import EventGrammar
from calendar_event_entity_extraction_ray.functions.htmltext import html_to_text
from calendar_event_entity_extraction_ray.functions.linking import EntityLinker
from calendar_event_entity_extraction_ray.functions.metrics import triple_prf
from calendar_event_entity_extraction_ray.functions.oracle import (
    golden_triples_from_slots,
    oracle_triples,
)
from calendar_event_entity_extraction_ray.functions.triples import event_to_triples
from calendar_event_entity_extraction_ray.sources.pages import synth_page


class TestHtmlToText:
    def test_golden_bytes(self):
        html = (
            b"<html><head><title>T</title><style>p{}</style></head><body>"
            b"<nav><ul><li>Home</li></ul></nav>"
            b"<h1>Head &amp; Line</h1>\n<p>One  two</p><p>A &lt;tag&gt;</p>"
            b"<footer>foot</footer></body></html>"
        )
        assert html_to_text(html) == "Head & Line\nOne two\nA <tag>"

    def test_drops_nav_footer_script(self):
        assert html_to_text(b"<nav><p>x</p></nav><p>keep</p>") == "keep"
        assert html_to_text(b"<script><p>x</p></script>") == ""

    def test_empty(self):
        assert html_to_text(None) == ""
        assert html_to_text(b"") == ""

    def test_byte_identical_per_url_on_fixture(self, fixture_pages):
        pages, _ = fixture_pages
        for p in pages:
            assert html_to_text(p["html"]) == p["text"], p["url"]


class TestEventGrammar:
    def setup_method(self):
        self.g = EventGrammar()

    def test_full_sentence(self):
        s = ("Schedule a meeting at Conference Room A on 10/05/2025 at 11:00 AM "
             "with John, Elizabeth Smith for 45 minutes repeating weekly "
             "(note: bring slides).")
        ev = self.g.extract_sentence(s)
        assert ev == {
            "action": "meeting", "date": "10/05/2025", "time": "11:00 AM",
            "attendees": ["John", "Elizabeth Smith"],
            "location": "Conference Room A", "duration": "45 minutes",
            "recurrence": "weekly", "notes": "bring slides",
        }

    def test_iso_date_dayfirst(self):
        ev = self.g.extract_sentence("Please book a call on 2025-06-03 at 4pm.")
        assert ev["date"] == "06/03/2025"  # dateutil dayfirst on ambiguous ISO
        assert ev["time"] == "4:00 PM"

    def test_24h_time(self):
        ev = self.g.extract_sentence("Add a sync on 01/02/2025 at 13:00.")
        assert ev["time"] == "1:00 PM"

    def test_noon(self):
        ev = self.g.extract_sentence("Add a lunch on 01/02/2025 at noon.")
        assert ev["time"] == "12:00 PM"

    def test_medium_location(self):
        ev = self.g.extract_sentence("Set up a demo via Zoom on 3rd March 2025 at 9AM.")
        assert ev["location"] == "Zoom"
        assert ev["date"] == "03/03/2025"
        assert ev["time"] == "9:00 AM"

    def test_sparse_row(self):
        ev = self.g.extract_sentence("Book a workout on 12/12/2025 at 7 AM.")
        assert ev["attendees"] is None
        assert ev["location"] is None
        assert ev["duration"] is None
        assert ev["recurrence"] is None
        assert ev["notes"] is None

    def test_non_event_lines_skipped(self):
        assert self.g.extract_sentence("Upcoming Events") is None
        assert self.g.extract_sentence("Contact the front desk.") is None

    def test_page_ordinals(self):
        text = "Title\nAdd a call on 01/02/2025 at 9AM.\nboiler\nAdd a demo on 02/02/2025 at 10AM."
        evs = self.g.extract_page(text)
        assert [e["event_ordinal"] for e in evs] == [0, 1]


class TestLinker:
    def setup_method(self):
        self.linker = EntityLinker()

    def test_exact_alias(self):
        assert self.linker.link("Jon", "person") == "John"
        assert self.linker.link("zoom", "place") == "Zoom"

    def test_case_insensitive(self):
        assert self.linker.link("ZOOM", "place") == "Zoom"
        assert self.linker.link("hq", "place") == "HQ"

    def test_fuzzy_typo(self):
        assert self.linker.link("Confrence Room A", "place") == "Conference Room A"
        assert self.linker.link("Comunity Center", "place") == "Community Center"

    def test_full_name_not_collapsed(self):
        # word-count blocking: "Katherine Lee" must NOT link to "Katherine"
        assert self.linker.link("Katherine Lee", "person") == "Katherine Lee"

    def test_unknown_identity(self):
        assert self.linker.link("Totally Unknown Venue", "place") == "Totally Unknown Venue"
        assert self.linker.link(None, "place") is None


class TestTriples:
    def test_explosion(self):
        slots = {"action": "call", "date": "01/02/2025", "time": None,
                 "attendees": ["A", "B"], "location": "HQ", "duration": None,
                 "recurrence": None, "notes": None}
        rows = event_to_triples("http://u", 0, slots)
        preds = [r[1] for r in rows]
        assert preds == ["hasAction", "hasDate", "hasAttendee", "hasAttendee",
                         "hasLocation"]
        assert len({r[0] for r in rows}) == 1  # one subject
        assert all(r[3] == "http://u" for r in rows)

    def test_event_id_deterministic(self):
        a = event_to_triples("http://u", 0, {"action": "x"})
        b = event_to_triples("http://u", 0, {"action": "x"})
        c = event_to_triples("http://u", 1, {"action": "x"})
        assert a[0][0] == b[0][0]
        assert a[0][0] != c[0][0]


class TestOraclePR:
    def test_oracle_matches_golden(self, fixture_pages):
        pages, golden = fixture_pages
        pred = [t[:3] for t in oracle_triples(pages)]
        gold = [t[:3] for t in golden_triples_from_slots(golden)]
        prf = triple_prf(pred, gold)
        assert prf["precision"] >= 0.95 and prf["recall"] >= 0.95
        # at fixture scale the match is exact
        assert prf["f1"] == 1.0

    def test_non_en_pages_produce_no_triples(self, fixture_pages):
        pages, _ = fixture_pages
        non_en = [p for p in pages if p["lang"] != "en"]
        assert non_en, "fixture should contain non-en pages"
        assert oracle_triples(non_en) == []


class TestDedupPrimitives:
    def test_jaccard(self):
        assert jaccard(set("ab"), set("ab")) == 1.0
        assert jaccard(set(), set()) == 1.0
        assert jaccard(set("a"), set()) == 0.0

    def test_minhash_similarity_correlates(self):
        h = MinHasher(num_perm=128)
        a = word_shingles("the quick brown fox jumps over the lazy dog today")
        b = word_shingles("the quick brown fox jumps over the lazy cat today")
        c = word_shingles("completely different words entirely unrelated text")
        sim_ab = (h.signature(a) == h.signature(b)).mean()
        sim_ac = (h.signature(a) == h.signature(c)).mean()
        assert sim_ab > sim_ac

    def test_band_keys_identical_for_identical_text(self):
        h = MinHasher()
        s = word_shingles("same text here")
        assert h.band_keys(h.signature(s)) == h.band_keys(h.signature(s))

    def test_simhash_near_for_near_text(self):
        a = simhash64("the quick brown fox jumps over the lazy dog " * 3)
        b = simhash64("the quick brown fox jumps over the lazy cat " * 3)
        c = simhash64("totally unrelated content about databases and engines")
        assert hamming64(a, b) < hamming64(a, c)

    def test_char_ngrams(self):
        assert char_ngrams("ab", 3) == {"ab"}
        assert "abc" in char_ngrams("abcd", 3)
