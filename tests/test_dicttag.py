"""Dictionary phrase tagging (stages/dicttag.py): vector and automaton
regimes, pinned identical to each other and to brute-force substring
truth; Aho-Corasick edge cases (overlaps, shared prefixes, suffix
outputs through failure links)."""

import pyarrow as pa
import pytest

from calendar_event_entity_extraction_ray.stages.dicttag import (
    AcTagger,
    _build_aho,
    tag_documents,
)


def _scan_phrases(phrases, text):
    """Direct automaton scan without Ray (unit-level)."""
    t = AcTagger(list(phrases), "text", "doc_id")
    return sorted(t.phrases[i] for i in t._scan(text))


def _brute(docs, phrases):
    return {(d, p) for d, t in docs for p in set(phrases) if p and p in (t or "")}


def _got(out):
    df = out.to_pandas()
    if df.empty:
        return set()
    return set(map(tuple, df[["doc_id", "tag"]].itertuples(index=False)))


class TestAutomaton:
    def test_overlapping_and_nested_matches(self):
        # "she" contains "he"; "hers" shares prefix with "he"; failure
        # links must surface the nested/suffix matches
        assert _scan_phrases(["he", "she", "his", "hers"],
                             "ushers") == ["he", "hers", "she"]

    def test_shared_prefix_longest_and_shortest(self):
        assert _scan_phrases(["ab", "abcd", "bc"], "abcd") == \
            ["ab", "abcd", "bc"]

    def test_no_match_and_empty_text(self):
        assert _scan_phrases(["xyz"], "abcabc") == []
        assert _scan_phrases(["xyz"], "") == []

    def test_match_at_start_and_end(self):
        assert _scan_phrases(["star", "end"], "start to the end") == \
            ["end", "star"]

    def test_single_char_alphabet_stress(self):
        # repeated-char phrases exercise fail-link chains
        assert _scan_phrases(["a", "aa", "aaa"], "aaaa") == \
            ["a", "aa", "aaa"]


class TestTagDocuments:
    DOCS = [
        (1, "fast table scan on a big table"),
        (2, "slow query and stream key order"),
        (3, "nothing relevant here"),
        (4, ""),
        (5, None),
        (6, "fast tablefast table"),   # duplicate occurrences -> one row
    ]
    PHRASES = ["fast table", "big table", "slow query", "stream key",
               "table scan", "fast table"]  # dup phrase collapses

    def _ds(self):
        import ray

        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([d for d, _ in self.DOCS], pa.int64()),
            "text": pa.array([t for _, t in self.DOCS], pa.string()),
        }))

    def test_vector_regime_matches_brute_force(self, ray_session):
        out = tag_documents(self._ds(), self.PHRASES, mode="vector")
        assert _got(out) == _brute(self.DOCS, self.PHRASES)

    def test_automaton_regime_matches_brute_force(self, ray_session):
        out = tag_documents(self._ds(), self.PHRASES, mode="automaton")
        assert _got(out) == _brute(self.DOCS, self.PHRASES)

    def test_auto_routes_large_dict_to_automaton(self, ray_session):
        # small_dict_max=2 forces the automaton route through "auto";
        # rows must not change
        out = tag_documents(self._ds(), self.PHRASES, mode="auto",
                            small_dict_max=2)
        assert _got(out) == _brute(self.DOCS, self.PHRASES)

    def test_empty_dictionary_raises(self, ray_session):
        with pytest.raises(ValueError):
            tag_documents(self._ds(), [])

    def test_regimes_identical_on_fixture_corpus(self, ray_session):
        """Both regimes over a generated corpus with adversarial
        overlap structure (phrases sharing prefixes/suffixes)."""
        words = ["scan", "scanner", "anne", "nne", "table", "able"]
        docs = [(i, " ".join(words[(i + j) % len(words)]
                             for j in range(5))) for i in range(40)]
        ds_tbl = pa.table({
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        })
        import ray

        phrases = ["scan", "anne", "able", "er a", "nne t"]
        a = tag_documents(ray.data.from_arrow(ds_tbl), phrases,
                          mode="vector")
        b = tag_documents(ray.data.from_arrow(ds_tbl), phrases,
                          mode="automaton")
        truth = _brute(docs, phrases)
        assert _got(a) == truth
        assert _got(b) == truth

    def test_build_aho_root_fail_links_are_root(self):
        goto, fail, out = _build_aho(["ab"])
        assert fail[goto[0]["a"]] == 0
