"""RefRng: the reference-exact RNG emulation behind scene parity.

Pins the Xoshiro256Plus + rand-0.9 sampling streams that make
light_bench_space bit-match the reference (content/testing.py RefRng).
The pinned values were cross-validated against the reference's own
`template-light-bench` renderer golden (tests/test_reference_goldens.py
passes within the reference threshold ONLY when these streams are
exact), so they protect that golden from silent RNG regressions.
"""

from __future__ import annotations

import numpy as np
import pytest

from aic_tpu.content.testing import RefRng, light_bench_space


class TestStreams:
    def test_splitmix64_seeding(self):
        # First raw u64 outputs for seed 0 (SplitMix64-expanded state).
        r = RefRng(0)
        first = [r.next_u64() for _ in range(3)]
        assert all(0 <= v < 2**64 for v in first)
        # Deterministic: same seed, same stream.
        r2 = RefRng(0)
        assert [r2.next_u64() for _ in range(3)] == first
        # Different seeds diverge immediately.
        assert RefRng(1).next_u64() != first[0]

    def test_next_u32_is_high_word(self):
        a = RefRng(7)
        b = RefRng(7)
        assert a.next_u32() == b.next_u64() >> 32

    @pytest.mark.parametrize(
        "seed,rgb,semi,shape",
        [
            # Pinned from the golden-validated stream (section = seed
            # in the 5x5 light-bench layout, draw order r,g,b,bool,int).
            (0, (0.854, 0.193, 0.975), False, 0),
            (1, (0.011, 0.886, 0.158), False, 1),
            (2, (0.357, 0.408, 0.184), False, 0),
            (5, (0.486, 0.051, 0.058), False, 1),
        ],
    )
    def test_section_draws_pinned(self, seed, rgb, semi, shape):
        rng = RefRng(seed)
        got = tuple(rng.random_f32_01_inclusive() for _ in range(3))
        assert np.allclose(got, rgb, atol=5e-4), got
        assert rng.random_bool(0.125) == semi
        assert rng.random_range_u32(3) == shape

    def test_f32_range_is_inclusive_unit(self):
        rng = RefRng(123)
        vals = [rng.random_f32_01_inclusive() for _ in range(2000)]
        assert min(vals) >= 0.0 and max(vals) <= 1.0
        assert 0.45 < float(np.mean(vals)) < 0.55

    def test_bool_threshold(self):
        rng = RefRng(9)
        hits = sum(rng.random_bool(0.125) for _ in range(4000))
        assert 350 < hits < 650  # ~500 expected

    def test_range_u32_uniform(self):
        rng = RefRng(11)
        counts = [0, 0, 0]
        for _ in range(3000):
            counts[rng.random_range_u32(3)] += 1
        assert all(800 < c < 1200 for c in counts)


class TestLightBenchStructure:
    def test_scene_contents_pinned(self):
        """Structural checksum of the parity-critical scene: any change
        to RNG, layout, or fill semantics shifts this and would break
        the renderer golden far more expensively."""
        sp = light_bench_space()
        contents = np.asarray(sp.contents)
        assert contents.shape == (54, 16, 54)
        assert sp.bounds.lower == (0, -11, 0)
        # Non-air census + hash pin (validated against the reference's
        # template-light-bench golden at recording time).
        nonair = int((contents != 0).sum())
        assert nonair == 33512, nonair

    def test_sections_straddle_ground(self):
        sp = light_bench_space()
        contents = np.asarray(sp.contents)
        # Noise sections carve air INTO the ground (testing.rs:105 fill
        # writes Some(&AIR)); ground level is solid outside sections.
        below = contents[:, :12, :]
        assert (below == 0).any(), "no carved air below grade"
        # Margins at y just below ground surface are solid ground.
        assert (contents[0:4, 11, 0:4] != 0).all()
