"""Entity resolution (stages/resolve.py): SymSpell deletion blocking,
band blocking, string-node connected components, brute-force parity."""

from __future__ import annotations

import itertools
import random

import pytest


def _brute_resolve(surfaces, max_d):
    """Single-process mirror: all-pairs DP distance + union-find."""
    from calendar_event_entity_extraction_ray.functions.editdist import (
        dp_distance,
    )

    forms = sorted(set(s for s in surfaces if s is not None))
    parent = {s: s for s in forms}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(forms, 2):
        if abs(len(a) - len(b)) <= max_d and dp_distance(a, b) <= max_d:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {s: find(s) for s in forms}


def _planted_corpus(seed=7, n_base=60, dupes=3):
    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    base = ["".join(rng.choice(alpha) for _ in range(rng.randint(6, 14)))
            for _ in range(n_base)]
    out = list(base)
    for s in base[:20]:
        for _ in range(dupes):
            i = rng.randrange(len(s))
            op = rng.choice(("sub", "del", "ins"))
            if op == "sub":
                v = s[:i] + rng.choice(alpha) + s[i + 1:]
            elif op == "del":
                v = s[:i] + s[i + 1:]
            else:
                v = s[:i] + rng.choice(alpha) + s[i:]
            out.append(v)
    rng.shuffle(out)
    return out


class TestDeletionVariants:
    def test_symspell_invariant(self):
        """dist(a,b) <= d => depth-d deletion neighborhoods intersect."""
        from calendar_event_entity_extraction_ray.functions.editdist import (
            deletion_variants,
            dp_distance,
        )

        corpus = _planted_corpus(seed=3, n_base=25, dupes=2)
        for d in (1, 2):
            for a, b in itertools.combinations(sorted(set(corpus)), 2):
                if dp_distance(a, b) <= d:
                    assert deletion_variants(a, d) & deletion_variants(b, d), \
                        (a, b, d)

    def test_includes_self_and_depth(self):
        from calendar_event_entity_extraction_ray.functions.editdist import (
            deletion_variants,
        )

        v = deletion_variants("abc", 1)
        assert v == {"abc", "ab", "ac", "bc"}
        assert "a" in deletion_variants("abc", 2)


class TestResolveSurfaceForms:
    @pytest.mark.parametrize("method", ["deletions", "bands"])
    @pytest.mark.parametrize("max_d", [1, 2])
    def test_matches_brute_force(self, ray_session, method, max_d):
        import ray.data

        from calendar_event_entity_extraction_ray.stages.resolve import (
            resolve_surface_forms,
        )

        corpus = _planted_corpus()
        want = _brute_resolve(corpus, max_d)
        ds = ray.data.from_items([{"surface": s} for s in corpus])
        got = resolve_surface_forms(ds, col="surface", max_d=max_d,
                                    method=method).to_pandas()
        assert dict(zip(got["surface"], got["entity_id"])) == want
        assert len(got) == len(want)  # distinct surfaces only

    def test_singletons_map_to_self(self, ray_session):
        import ray.data

        from calendar_event_entity_extraction_ray.stages.resolve import (
            resolve_surface_forms,
        )

        ds = ray.data.from_items(
            [{"surface": s} for s in ["aaaa", "bbbb", "cccc", None]])
        got = resolve_surface_forms(ds, col="surface").to_pandas()
        assert sorted(zip(got["surface"], got["entity_id"])) == [
            ("aaaa", "aaaa"), ("bbbb", "bbbb"), ("cccc", "cccc")]

    def test_transitive_chain_is_one_entity(self, ray_session):
        """A~B, B~C chain into one cluster even when dist(A,C) > d."""
        import ray.data

        from calendar_event_entity_extraction_ray.stages.resolve import (
            resolve_surface_forms,
        )

        ds = ray.data.from_items(
            [{"surface": s} for s in ["abcdef", "abcdeg", "abcdgg"]])
        got = resolve_surface_forms(ds, col="surface", max_d=1).to_pandas()
        assert set(got["entity_id"]) == {"abcdef"}

    def test_iterative_string_cc_path(self, ray_session):
        """num_partitions forces the exchange/iterative CC path: string
        labels use the hash-sum convergence detector (stages/graph.py)."""
        import ray.data

        from calendar_event_entity_extraction_ray.stages.resolve import (
            resolve_surface_forms,
        )

        corpus = _planted_corpus(seed=11)
        want = _brute_resolve(corpus, 1)
        ds = ray.data.from_items([{"surface": s} for s in corpus])
        got = resolve_surface_forms(ds, col="surface", max_d=1,
                                    num_partitions=3).to_pandas()
        assert dict(zip(got["surface"], got["entity_id"])) == want


class TestStringIdLevenshteinPairs:
    def test_string_ids_preserved(self, ray_session):
        """levenshtein_pairs with a string id column keeps the type and
        emits each pair once (type-generalization for resolve)."""
        import ray.data

        from calendar_event_entity_extraction_ray.stages.editdist import (
            levenshtein_pairs,
        )

        rows = [{"sid": s, "txt": s}
                for s in ["kitten", "sitten", "mitten", "flour"]]
        ds = ray.data.from_items(rows)
        out = levenshtein_pairs(ds, 1, id_col="sid", text_col="txt")
        df = out.to_pandas().sort_values(["sid_a", "sid_b"])
        assert list(map(tuple, df[["sid_a", "sid_b"]].values)) == [
            ("kitten", "mitten"), ("kitten", "sitten"),
            ("mitten", "sitten")]
        assert (df["dist"] == 1).all()


class TestResolveGraphEntities:
    def _triples(self):
        import datetime

        import ray.data

        ts = datetime.datetime(2025, 6, 1)
        rows = []
        for subj, pred, obj, kind in [
            ("e1", "hasAttendee", "alice johnson", "person"),
            ("e2", "hasAttendee", "alice johnsen", "person"),
            ("e3", "hasAttendee", "bob stone", "person"),
            ("e4", "atLocation", "berlin", "place"),
            ("e5", "atLocation", "berlim", "place"),
            # untyped objects NEVER merge, however close (dates d=1):
            ("e6", "onDate", "2025-06-01", ""),
            ("e7", "onDate", "2025-06-02", ""),
            # same surface in both kinds resolves independently
            ("e8", "atLocation", "alice johnson", "place"),
        ]:
            rows.append({"subj": subj, "pred": pred, "obj": obj,
                         "kind": kind, "url": "u", "warc_ts": ts})
        return ray.data.from_items(rows)

    WANT = {
        "e1": "alice johnsen", "e2": "alice johnsen", "e3": "bob stone",
        "e4": "berlim", "e5": "berlim",
        "e6": "2025-06-01", "e7": "2025-06-02",
        # no place-kind pair for "alice johnson" -> stays itself
        "e8": "alice johnson",
    }

    def test_broadcast_regime(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.resolve import (
            resolve_graph_entities,
        )

        out = resolve_graph_entities(self._triples()).to_pandas()
        assert dict(zip(out["subj"], out["obj"])) == self.WANT

    def test_exchange_regime_identical(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.resolve import (
            resolve_graph_entities,
        )

        out = resolve_graph_entities(self._triples(),
                                     broadcast_max=0).to_pandas()
        assert dict(zip(out["subj"], out["obj"])) == self.WANT

    def test_rewrite_merges_duplicate_triples(self, ray_session):
        """Two mentions of d<=1 variants under ONE subject collapse to a
        single distinct triple after canonicalization."""
        import datetime

        import ray.data

        from calendar_event_entity_extraction_ray.stages.resolve import (
            resolve_graph_entities,
        )

        import pyarrow as pa

        ts = datetime.datetime(2025, 6, 1)
        # ONE block: the in-stage dedup is per-batch (the global distinct
        # is the graph materialize's per-partition fold — dedup-by-design)
        t = pa.table({
            "subj": ["e1", "e1"], "pred": ["hasAttendee"] * 2,
            "obj": ["carol smith", "carol smitt"], "kind": ["person"] * 2,
            "url": ["u"] * 2,
            "warc_ts": pa.array([ts, ts], pa.timestamp("us")),
        })
        out = resolve_graph_entities(ray.data.from_arrow(t)).to_pandas()
        assert list(out["obj"]) == ["carol smith"]
        assert len(out) == 1

    def test_noop_when_all_singletons(self, ray_session):
        import datetime

        import ray.data

        from calendar_event_entity_extraction_ray.stages.resolve import (
            resolve_graph_entities,
        )

        ts = datetime.datetime(2025, 6, 1)
        rows = [{"subj": f"e{i}", "pred": "hasAttendee", "obj": o,
                 "kind": "person", "url": "u", "warc_ts": ts}
                for i, o in enumerate(["aaaaaa", "bbbbbb"])]
        out = resolve_graph_entities(
            ray.data.from_items(rows)).to_pandas()
        assert sorted(out["obj"]) == ["aaaaaa", "bbbbbb"]


class TestFrequentCanonical:
    def test_common_spelling_beats_typo(self, ray_session):
        """The typo sorts FIRST lexicographically but loses on count."""
        import ray.data

        from calendar_event_entity_extraction_ray.stages.resolve import (
            resolve_surface_forms,
        )

        rows = ([{"surface": "aalice"}] * 2      # typo, lexicographic min
                + [{"surface": "balice"}] * 9)   # common spelling
        ds = ray.data.from_items(rows)
        got_min = resolve_surface_forms(ds, col="surface").to_pandas()
        got_frq = resolve_surface_forms(ds, col="surface",
                                        canonical="frequent").to_pandas()
        assert set(got_min["entity_id"]) == {"aalice"}
        assert set(got_frq["entity_id"]) == {"balice"}

    def test_tie_breaks_lexicographic(self, ray_session):
        import ray.data

        from calendar_event_entity_extraction_ray.stages.resolve import (
            resolve_surface_forms,
        )

        rows = [{"surface": "zebra"}, {"surface": "zebrb"}]  # 1 each
        got = resolve_surface_forms(
            ray.data.from_items(rows), canonical="frequent").to_pandas()
        assert set(got["entity_id"]) == {"zebra"}

    def test_singletons_self_canonical(self, ray_session):
        import ray.data

        from calendar_event_entity_extraction_ray.stages.resolve import (
            resolve_surface_forms,
        )

        rows = [{"surface": "aaaaaa"}] * 5 + [{"surface": "zzzzzz"}]
        got = resolve_surface_forms(
            ray.data.from_items(rows), canonical="frequent").to_pandas()
        assert dict(zip(got["surface"], got["entity_id"])) == {
            "aaaaaa": "aaaaaa", "zzzzzz": "zzzzzz"}
