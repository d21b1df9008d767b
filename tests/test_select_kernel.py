"""Per-anchor top-2 selection kernel (kernels/select_pallas.py) parity tests.

Interpret-mode kernel vs the XLA reference vs a numpy oracle. The kernel is
a MEASURED NEGATIVE RESULT (7x slower than ops/nms.py's two-stage scheme on
the chip — unaligned-minor DMA; see its module docstring) kept as tested
groundwork; compiled-on-TPU correctness is captured by tools/tpu_selfcheck.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_retinanet_tpu.kernels.select_pallas import (
    pallas_top2_classes,
    top2_reference_xla,
)


def _numpy_top2(x: np.ndarray):
    """Oracle: lowest-index tie-breaks, exactly like lax.top_k row order."""
    xf = x.astype(np.float32)
    order = np.argsort(-xf, axis=1, kind="stable")
    c1, c2 = order[:, 0], order[:, 1]
    rows = np.arange(x.shape[0])
    return xf[rows, c1], c1.astype(np.int32), xf[rows, c2], c2.astype(np.int32)


class TestTop2Kernel:
    @pytest.mark.parametrize(
        "a,c", [(9450, 90), (1512, 90), (700, 13), (64, 128), (40, 7)]
    )
    def test_interpret_matches_reference_and_oracle(self, a, c):
        rng = np.random.default_rng(a + c)
        x_np = rng.normal(-4.0, 2.0, (a, c)).astype(np.float32)
        x = jnp.asarray(x_np).astype(jnp.bfloat16)

        got = [np.asarray(o) for o in pallas_top2_classes(x, interpret=True)]
        ref = [np.asarray(o) for o in top2_reference_xla(x)]
        oracle = _numpy_top2(np.asarray(x, np.float32))
        for name, g, r, o in zip(("v1", "c1", "v2", "c2"), got, ref, oracle):
            np.testing.assert_array_equal(g, r, err_msg=f"{name} vs xla ref")
            np.testing.assert_array_equal(g, o, err_msg=f"{name} vs oracle")

    def test_ties_break_to_lowest_class(self):
        x = jnp.zeros((24, 17), jnp.bfloat16).at[:, 3].set(5.0).at[:, 11].set(5.0)
        v1, c1, v2, c2 = (
            np.asarray(o) for o in pallas_top2_classes(x, interpret=True)
        )
        assert (v1 == 5.0).all() and (c1 == 3).all()
        assert (v2 == 5.0).all() and (c2 == 11).all()

    def test_non_divisible_rows_clamped_grid(self):
        """A=9450 has no multiple-of-8 divisor >= 1024; the clamped last
        block re-computes overlapping rows — values must still be exact."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (9450, 90)).astype(np.float32))
        got = [np.asarray(o) for o in pallas_top2_classes(x, interpret=True)]
        oracle = _numpy_top2(np.asarray(x))
        for g, o in zip(got, oracle):
            np.testing.assert_array_equal(g, o)

    def test_too_few_rows_raises(self):
        with pytest.raises(ValueError):
            pallas_top2_classes(jnp.zeros((4, 9)), interpret=True)
