"""Bisect the Pallas relight hw-vs-interpret divergence via ablations."""

import os
import sys

import numpy as np


def main():
    ablate = sys.argv[1] if len(sys.argv) > 1 else ""
    os.environ["AIC_PALLAS_ABLATE"] = ablate
    import jax

    from aic_tpu.content import cornell_box
    from aic_tpu.light.dense import build_relight_ctx
    from aic_tpu.light import pallas_relight as pr

    state = cornell_box(8).snapshot()
    ctx = build_relight_ctx(state)
    a = np.asarray(pr.relight_all_pass_pallas(state, ctx, interpret=True)).astype(int)
    b = np.asarray(pr.relight_all_pass_pallas(state, ctx, interpret=False)).astype(int)
    d = np.abs(a - b)
    print(
        f"ablate={ablate!r}: hw-vs-interp max diff {d.max()} "
        f"ndiff {(d > 0).sum()}/{d.size}"
    )


if __name__ == "__main__":
    main()
