"""Property-based tests (hypothesis): total functions never raise, are
deterministic, and respect their invariants on arbitrary input."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from calendar_event_entity_extraction_ray import TARGET_KEYS
from calendar_event_entity_extraction_ray.functions.dedup import (
    char_ngrams,
    jaccard,
    simhash64,
)
from calendar_event_entity_extraction_ray.functions.extract import EventGrammar
from calendar_event_entity_extraction_ray.functions.htmltext import html_to_text
from calendar_event_entity_extraction_ray.functions.jsonx import safe_json_load
from calendar_event_entity_extraction_ray.functions.normalize import (
    normalize_date,
    normalize_time,
)
from calendar_event_entity_extraction_ray.functions.schema import (
    canonicalize_output,
    ensure_output_schema_row,
)
from calendar_event_entity_extraction_ray.functions.textsig import (
    event_text_signature,
    hash64,
    stable_bucket,
)

_GRAMMAR = EventGrammar()

text_strategy = st.text(max_size=300)


class TestTotality:
    """No input may crash these functions (the reference's silent-None
    contract, main.py:76-96)."""

    @given(text_strategy)
    @settings(max_examples=200, deadline=None)
    def test_normalize_date_total(self, s):
        out = normalize_date(s)
        assert out is None or isinstance(out, str)

    @given(text_strategy)
    @settings(max_examples=200, deadline=None)
    def test_normalize_time_total(self, s):
        out = normalize_time(s)
        assert out is None or isinstance(out, str)

    @given(text_strategy)
    @settings(max_examples=100, deadline=None)
    def test_safe_json_load_total(self, s):
        safe_json_load(s)

    @given(st.binary(max_size=500))
    @settings(max_examples=100, deadline=None)
    def test_html_to_text_total(self, b):
        assert isinstance(html_to_text(b), str)

    @given(text_strategy)
    @settings(max_examples=100, deadline=None)
    def test_extract_sentence_total(self, s):
        ev = _GRAMMAR.extract_sentence(s.replace("\n", " "))
        if ev is not None:
            assert set(ev) == set(TARGET_KEYS)


class TestDeterminismAndInvariants:
    @given(text_strategy)
    @settings(max_examples=100, deadline=None)
    def test_signature_idempotent(self, s):
        sig = event_text_signature(s)
        assert event_text_signature(sig) == sig
        assert sig == sig.strip().lower()

    @given(text_strategy)
    @settings(max_examples=100, deadline=None)
    def test_hashes_stable(self, s):
        assert hash64(s) == hash64(s)
        assert 0 <= stable_bucket(s, 10000) < 10000

    @given(text_strategy)
    @settings(max_examples=50, deadline=None)
    def test_jaccard_self_is_one(self, s):
        g = char_ngrams(s)
        assert jaccard(g, g) == 1.0

    @given(text_strategy, text_strategy)
    @settings(max_examples=50, deadline=None)
    def test_jaccard_bounded_symmetric(self, a, b):
        ga, gb = char_ngrams(a), char_ngrams(b)
        j = jaccard(ga, gb)
        assert 0.0 <= j <= 1.0
        assert j == jaccard(gb, ga)

    @given(text_strategy)
    @settings(max_examples=50, deadline=None)
    def test_simhash_deterministic(self, s):
        assert simhash64(s) == simhash64(s)
        assert 0 <= simhash64(s) < (1 << 64)

    @given(st.dictionaries(st.sampled_from(TARGET_KEYS + ["junk", "json"]),
                           st.one_of(st.none(), st.text(max_size=20))))
    @settings(max_examples=100, deadline=None)
    def test_schema_coercion_shape(self, payload):
        row = ensure_output_schema_row({"event_text": "t", "output": payload})
        assert set(row["output"]) == set(TARGET_KEYS)
        for v in row["output"].values():
            assert v is None or (isinstance(v, str) and v.strip() != "")
        rec = canonicalize_output({"event_text": "t", "output": payload})
        assert set(rec["output"]) == set(TARGET_KEYS)

    @given(st.integers(min_value=0, max_value=5000))
    @settings(max_examples=30, deadline=None)
    def test_page_generator_deterministic(self, i):
        from calendar_event_entity_extraction_ray.sources.pages import synth_page

        a_page, a_golden = synth_page(i, seed=42)
        b_page, b_golden = synth_page(i, seed=42)
        assert a_page == b_page
        assert a_golden == b_golden
        # the golden text is always byte-identical to the extraction rule
        assert html_to_text(a_page["html"]) == a_page["text"]


class TestAnalyticDateFastPath:
    def test_matches_dateutil_exhaustively(self):
        """The generator's analytic golden-date fast path must equal the
        reference normalization for EVERY (day, month, year, style) the
        grammar can emit."""
        import calendar
        from datetime import datetime

        from calendar_event_entity_extraction_ray.functions import grammar as G

        for y in (2024, 2025, 2026):
            for m in range(1, 13):
                for d in range(1, calendar.monthrange(y, m)[1] + 1):
                    dt = datetime(y, m, d)
                    for style in range(6):
                        surface = G.format_date_text(dt, style)
                        assert (normalize_date(surface)
                                == G.expected_normalized_date(dt, style)), (
                            surface, style)


class TestNoise:
    def test_noise_deterministic_and_bounded(self):
        import random

        from calendar_event_entity_extraction_ray.functions.noise import apply_noise

        texts = [f"meeting about calendar in 30 minutes tomorrow #{i}"
                 for i in range(200)]
        a = [apply_noise(t, random.Random(f"n:{i}")) for i, t in enumerate(texts)]
        b = [apply_noise(t, random.Random(f"n:{i}")) for i, t in enumerate(texts)]
        assert a == b
        changed = sum(1 for t, o in zip(texts, a) if t != o)
        assert 0 < changed < 60  # ~10% gate


class TestTokenizerProperties:
    """Invariants of the tokenized-feature operator on arbitrary input."""

    @given(text_strategy, text_strategy)
    @settings(max_examples=150, deadline=None)
    def test_prefix_consistency(self, prefix, rest):
        """tokenize(prefix) is always a prefix of tokenize(prefix + ' ' +
        rest) — the property the prompt-masking boundary relies on (the
        space forces a piece boundary; whitespace carries no token)."""
        from calendar_event_entity_extraction_ray.functions.tokenizer import (
            ToyTokenizer,
        )

        tok = ToyTokenizer()
        p = tok.encode(prefix)
        full = tok.encode(prefix + " " + rest)
        assert full[: len(p)] == p

    @given(text_strategy, text_strategy)
    @settings(max_examples=150, deadline=None)
    def test_feature_invariants(self, prompt, completion):
        """Aligned lengths, attention all-ones, masked region exactly the
        prompt tokens, unmasked labels equal the input ids."""
        from calendar_event_entity_extraction_ray.functions.tokenizer import (
            IGNORE_INDEX,
            ToyTokenizer,
            build_feature,
        )

        tok = ToyTokenizer()
        f = build_feature({"prompt": prompt, "completion": completion},
                          tok, max_length=64)
        n = len(f["input_ids"])
        assert len(f["labels"]) == n and len(f["attention_mask"]) == n
        assert n <= 64
        assert all(m == 1 for m in f["attention_mask"])
        plen = len(tok.encode(prompt))
        if plen < n:
            assert f["labels"][:plen] == [IGNORE_INDEX] * plen
            assert f["labels"][plen:] == f["input_ids"][plen:]
        else:
            assert f["labels"] == f["input_ids"]  # guard skipped the mask

    @given(text_strategy)
    @settings(max_examples=100, deadline=None)
    def test_enhanced_renderer_total(self, action):
        """render_enhanced never raises, never leaks placeholders, and is
        deterministic for a fixed seed."""
        import random

        from calendar_event_entity_extraction_ray.functions.render_enhanced import (
            render_enhanced,
        )

        slots = {k: None for k in TARGET_KEYS}
        slots["action"] = action or None
        a = render_enhanced(dict(slots), random.Random(3))
        b = render_enhanced(dict(slots), random.Random(3))
        assert a == b
        if not set(action or "") & {"{", "}"}:
            # braces inside slot VALUES legitimately survive (the cleanup
            # regex targets placeholder-shaped spans only — reference
            # semantics); otherwise no placeholder may leak
            assert "{" not in a and "}" not in a


class TestSketchProperties:
    @given(st.lists(st.integers(min_value=0, max_value=200), min_size=1,
                    max_size=2000),
           st.integers(min_value=1, max_value=1999))
    @settings(max_examples=50, deadline=None)
    def test_misra_gries_guarantee_under_any_split(self, items, cut):
        """Merging two partial sketches from ANY split of the stream
        preserves the frequent-items guarantee: estimates never exceed
        true counts and undercount by at most n/(k+1)."""
        from collections import Counter

        from calendar_event_entity_extraction_ray.functions.sketch import (
            MisraGries,
        )

        cut = min(cut, len(items))
        k = 16
        a = MisraGries(k=k).add_many(items[:cut])
        b = MisraGries(k=k).add_many(items[cut:])
        a.merge(MisraGries.deserialize(b.serialize(), k=k))
        true = Counter(items)
        n = len(items)
        for x, cnt in true.items():
            est = a.counters.get(x, 0)
            assert est <= cnt
            assert est >= cnt - n / (k + 1) - 1e-9
        assert len(a.counters) <= k

    @given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                    min_size=1, max_size=500),
           st.integers(min_value=0, max_value=499))
    @settings(max_examples=50, deadline=None)
    def test_bloom_never_false_negative(self, keys, probe_ix):
        import numpy as np

        from calendar_event_entity_extraction_ray.functions.bloom import (
            BloomFilter,
        )

        arr = np.asarray(keys, dtype=np.int64)
        f = BloomFilter(n_bits=1 << 12, k=4).add_hashes(arr)
        assert f.contains_hashes(arr).all()
        # split-and-merge equals one-shot
        g = BloomFilter(n_bits=1 << 12, k=4)
        cut = min(probe_ix, len(arr))
        g.add_hashes(arr[:cut]).merge(
            BloomFilter(n_bits=1 << 12, k=4).add_hashes(arr[cut:]))
        assert (g.words == f.words).all()


class TestQuantileRankRule:
    @given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                              width=32),
                    min_size=1, max_size=300),
           st.floats(min_value=0.0, max_value=1.0))
    @settings(max_examples=100, deadline=None)
    def test_disc_rank_in_bounds_and_monotone(self, vals, q):
        from calendar_event_entity_extraction_ray.stages.quantiles import (
            disc_rank,
        )

        n = len(vals)
        r = disc_rank(q, n)
        assert 1 <= r <= n
        # monotone in q
        assert disc_rank(min(1.0, q + 0.1), n) >= r
