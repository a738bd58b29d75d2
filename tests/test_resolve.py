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
