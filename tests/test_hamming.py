"""Exact banded hamming pair join (stages/hamming.py) + pHash kernel:
brute-force equality on random fingerprints, planted-twin recall,
band-cap behavior."""

import numpy as np
import pandas as pd
import pytest


def _brute(ids, hashes, max_dist):
    from calendar_event_entity_extraction_ray.stages.hamming import (
        popcount64,
    )

    h = np.asarray(hashes, dtype=np.uint64)
    out = set()
    for i in range(len(ids)):
        d = popcount64(h[i] ^ h[i + 1:])
        for j in np.nonzero(d <= max_dist)[0]:
            a, b = sorted((ids[i], ids[i + 1 + j]))
            out.add((a, b, int(d[j])))
    return out


class TestHammingPairs:
    def test_matches_brute_force_random(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.hamming import (
            hamming_near_pairs,
        )

        rng = np.random.RandomState(17)
        n = 600
        base = rng.randint(0, 2**63, n).astype(np.uint64)
        # plant close pairs: flip <=4 random bits of earlier hashes
        for k in range(0, n, 7):
            src = base[k]
            for b in rng.randint(0, 64, rng.randint(0, 5)):
                src ^= np.uint64(1) << np.uint64(b)
            base[(k + 3) % n] = src
        ids = np.arange(n, dtype=np.int64)
        df = pd.DataFrame({"vid": ids, "h": base.view(np.int64)})
        want = _brute(ids.tolist(), base, 3)
        for nblocks in (2, 9):
            ds = ray.data.from_pandas(df).repartition(nblocks)
            got = hamming_near_pairs(ds, "h", "vid", 3).to_pandas()
            assert set(map(tuple, got[["id_a", "id_b", "dist"]]
                           .itertuples(index=False))) == want
        assert len(want) > 0

    def test_band_cap_only_skips(self, ray_session):
        """Capped buckets can only LOSE pairs, never invent them: with
        band 0 degenerate (shared by every row) and capped, exact-dup
        pairs still surface via the other bands."""
        import ray

        from calendar_event_entity_extraction_ray.stages.hamming import (
            hamming_near_pairs,
        )

        rng = np.random.RandomState(3)
        n = 300
        h = rng.randint(0, 2**62, n).astype(np.uint64)
        h = (h >> np.uint64(16)) << np.uint64(16)  # band 0 == 0 for all
        h[50] = h[10]  # exact twin
        h[60] = h[20]
        df = pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                           "h": h.view(np.int64)})
        want = _brute(list(range(n)), h, 2)
        ds = ray.data.from_pandas(df).repartition(4)
        got = hamming_near_pairs(ds, "h", "vid", 2,
                                 max_band_size=10).to_pandas()
        got_set = set(map(tuple, got[["id_a", "id_b", "dist"]]
                          .itertuples(index=False)))
        assert got_set <= want  # never invents
        assert (10, 50, 0) in got_set and (20, 60, 0) in got_set

    def test_phash_twins_close_distinct_far(self):
        from calendar_event_entity_extraction_ray.functions.imagecodec import (
            decode_ppm,
            phash64,
        )
        from calendar_event_entity_extraction_ray.stages.multimodal import (
            synth_media_with_twins,
            synth_pixels,
        )

        t = synth_media_with_twins(60, twin_every=3)
        hs = {}
        for i, kind, p in zip(t.column("media_id").to_pylist(),
                              t.column("kind").to_pylist(),
                              t.column("payload").to_pylist()):
            if kind == "image":
                hs[i] = phash64(decode_ppm(p))
        twins = [(i, i + 1_000_000) for i in hs if i < 1_000_000
                 and (i + 1_000_000) in hs]
        assert twins
        pop = lambda a, b: bin(a ^ b).count("1")
        for a, b in twins:
            assert pop(hs[a], hs[b]) <= 6
        # distinct originals should be far apart on average
        orig = sorted(i for i in hs if i < 1_000_000)
        dists = [pop(hs[a], hs[b])
                 for a in orig[:10] for b in orig[:10] if a < b]
        assert np.mean(dists) > 15

    def test_phash_deterministic_and_64bit(self):
        from calendar_event_entity_extraction_ray.functions.imagecodec import (
            phash64,
        )
        from calendar_event_entity_extraction_ray.stages.multimodal import (
            synth_pixels,
        )

        px = synth_pixels(7, 24, 20, 42)
        a, b = phash64(px), phash64(px.copy())
        assert a == b
        assert 0 <= a < (1 << 64)

    def test_afp_twins_zero_distinct_far(self):
        from calendar_event_entity_extraction_ray.functions.audiocodec import (
            afp64,
            decode_wav,
        )
        from calendar_event_entity_extraction_ray.stages.multimodal import (
            synth_media_with_audio_twins,
        )

        t = synth_media_with_audio_twins(45, twin_every=2)
        hs = {}
        for i, kind, p in zip(t.column("media_id").to_pylist(),
                              t.column("kind").to_pylist(),
                              t.column("payload").to_pylist()):
            if kind == "audio":
                hs[i] = afp64(decode_wav(p)[0])
        twins = [(i, i + 2_000_000) for i in hs
                 if i < 2_000_000 and (i + 2_000_000) in hs]
        assert twins
        pop = lambda a, b: bin(a ^ b).count("1")
        for a, b in twins:
            assert pop(hs[a], hs[b]) <= 8
        orig = sorted(i for i in hs if i < 2_000_000)
        dists = [pop(hs[a], hs[b])
                 for a in orig[:8] for b in orig[:8] if a < b]
        import numpy as np
        assert np.mean(dists) > 14
