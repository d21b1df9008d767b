"""Loss math parity against independent torch computations."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pytorch_retinanet_tpu.ops import sigmoid_focal_loss, smooth_l1_loss


def torch_sigmoid_focal(logits, targets, alpha=0.25, gamma=2.0):
    """torchvision.ops.sigmoid_focal_loss reimplemented from its definition."""
    p = torch.sigmoid(logits)
    ce = F.binary_cross_entropy_with_logits(logits, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return alpha_t * loss


class TestFocalParity:
    def test_matches_torchvision_definition(self, rng):
        logits = rng.normal(0, 3, (64, 7)).astype(np.float32)
        targets = (rng.uniform(size=(64, 7)) > 0.8).astype(np.float32)
        ours = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
        ref = torch_sigmoid_focal(
            torch.from_numpy(logits), torch.from_numpy(targets)
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_extreme_logits_stable(self):
        logits = jnp.asarray([[-80.0, 80.0], [80.0, -80.0]])
        targets = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
        out = np.asarray(sigmoid_focal_loss(logits, targets))
        assert np.all(np.isfinite(out))
        assert np.all(out < 1e-6)  # confident & correct => ~0 loss

    def test_gradient_matches_torch(self, rng):
        logits = rng.normal(0, 2, (16, 3)).astype(np.float32)
        targets = (rng.uniform(size=(16, 3)) > 0.7).astype(np.float32)
        import jax

        g_ours = np.asarray(
            jax.grad(lambda x: jnp.sum(sigmoid_focal_loss(x, jnp.asarray(targets))))(
                jnp.asarray(logits)
            )
        )
        t = torch.from_numpy(logits).requires_grad_(True)
        torch_sigmoid_focal(t, torch.from_numpy(targets)).sum().backward()
        np.testing.assert_allclose(g_ours, t.grad.numpy(), rtol=1e-4, atol=1e-5)


class TestSmoothL1Parity:
    def test_matches_torch_beta(self, rng):
        pred = rng.normal(0, 1, (32, 4)).astype(np.float32)
        target = rng.normal(0, 1, (32, 4)).astype(np.float32)
        ours = np.asarray(smooth_l1_loss(jnp.asarray(pred), jnp.asarray(target), 0.1))
        ref = F.smooth_l1_loss(
            torch.from_numpy(pred), torch.from_numpy(target), reduction="none", beta=0.1
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_zero_beta_is_l1(self, rng):
        pred = rng.normal(0, 1, (8,)).astype(np.float32)
        target = rng.normal(0, 1, (8,)).astype(np.float32)
        ours = np.asarray(smooth_l1_loss(jnp.asarray(pred), jnp.asarray(target), 0.0))
        np.testing.assert_allclose(ours, np.abs(pred - target), rtol=1e-6)
