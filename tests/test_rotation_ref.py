"""GridRotation algebra tests ported from the reference
(all-is-cubes-base/src/math/rotation.rs tests): identity, inverse
axioms, composition consistency, reflection classification, and
enumeration."""

import numpy as np

from aic_tpu.math.grid import (
    IDENTITY_ROTATION,
    ROTATION_MATRICES,
    compose_rotations,
    inverse_rotation,
    rotation_from_name,
    rotation_name,
)

ALL = range(48)


class TestAlgebra:
    def test_identity(self):
        """rotation.rs:682."""
        np.testing.assert_array_equal(
            ROTATION_MATRICES[IDENTITY_ROTATION], np.eye(3, dtype=int)
        )
        for r in ALL:
            assert compose_rotations(IDENTITY_ROTATION, r) == r
            assert compose_rotations(r, IDENTITY_ROTATION) == r

    def test_inverse_axioms(self):
        """rotation.rs:692 — r⁻¹∘r = r∘r⁻¹ = identity, and (r⁻¹)⁻¹ = r."""
        for r in ALL:
            inv = inverse_rotation(r)
            assert compose_rotations(inv, r) == IDENTITY_ROTATION
            assert compose_rotations(r, inv) == IDENTITY_ROTATION
            assert inverse_rotation(inv) == r

    def test_inverse_effect(self):
        """rotation.rs:701 — applying r then r⁻¹ restores any vector."""
        v = np.array([1, 2, 3])
        for r in ALL:
            m = ROTATION_MATRICES[r]
            mi = ROTATION_MATRICES[inverse_rotation(r)]
            np.testing.assert_array_equal(mi @ (m @ v), v)

    def test_composition_consistency(self):
        """rotation.rs:735 — the index-level composition matches matrix
        multiplication, for all 48×48 pairs."""
        for a in ALL:
            for b in ALL:
                got = ROTATION_MATRICES[compose_rotations(a, b)]
                want = ROTATION_MATRICES[a] @ ROTATION_MATRICES[b]
                np.testing.assert_array_equal(got, want, err_msg=f"{a}∘{b}")

    def test_is_reflection_consistency(self):
        """rotation.rs:753 — det −1 ⇔ reflection; the 48 split 24/24."""
        dets = [round(float(np.linalg.det(ROTATION_MATRICES[r]))) for r in ALL]
        assert all(d in (-1, 1) for d in dets)
        assert sum(1 for d in dets if d == 1) == 24
        assert sum(1 for d in dets if d == -1) == 24

    def test_enumeration(self):
        """rotation.rs:768 — exactly 48 distinct signed permutations."""
        seen = {ROTATION_MATRICES[r].tobytes() for r in ALL}
        assert len(seen) == 48


class TestNames:
    def test_names_round_trip(self):
        """rotation.rs naming — R{±X}{±Y}{±Z} naming is a bijection."""
        names = {rotation_name(r) for r in ALL}
        assert len(names) == 48
        for r in ALL:
            assert rotation_from_name(rotation_name(r)) == r

    def test_known_names(self):
        """RXYZ is the identity; RxYZ mirrors X."""
        assert rotation_from_name("RXYZ") == IDENTITY_ROTATION
        m = ROTATION_MATRICES[rotation_from_name("RxYZ")]
        np.testing.assert_array_equal(m, np.diag([-1, 1, 1]))
