"""Optimizer + LR-scheduler registry: torch config names → optax.

The reference instantiates optimizers and schedulers by dotted torch path from
YAML (``hparams.yaml:63-82`` via ``load_obj`` at ``model.py:76-90``), e.g.
``torch.optim.SGD`` / ``torch.optim.lr_scheduler.ReduceLROnPlateau``. This
module keeps that exact config surface but resolves the names through a
registry onto optax transforms (SURVEY.md §2.2) — no arbitrary imports.

The learning rate is injected as a mutable hyperparameter
(``optax.inject_hyperparams``) so host-side scheduler objects — including the
stateful ReduceLROnPlateau, which depends on a monitored metric — can set it
between steps without recompiling the train step.

Scheduler stepping semantics mirror the reference's Lightning config
(``interval`` ∈ {"epoch", "step"}, ``frequency``, ``monitor`` —
``model.py:85-90``): the Trainer calls :meth:`LRScheduler.step` at that
cadence and writes the returned LR into the optimizer state.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Mapping, Optional, Sequence

import optax


# --------------------------------------------------------------------------- #
# Optimizers
# --------------------------------------------------------------------------- #
def _sgd(lr: float, momentum: float = 0.0, weight_decay: float = 0.0,
         nesterov: bool = False, dampening: float = 0.0) -> optax.GradientTransformation:
    txs = []
    if weight_decay:
        # torch SGD couples weight decay into the gradient (L2), pre-momentum.
        txs.append(optax.add_decayed_weights(weight_decay))
    # An injected momentum arrives as a jnp scalar whose truthiness is not a
    # python bool — only collapse LITERAL 0/None to the stateless SGD.
    if isinstance(momentum, (int, float)) and not momentum:
        momentum = None
    txs.append(optax.sgd(lr, momentum=momentum, nesterov=nesterov))
    return optax.chain(*txs)


def _adam(lr: float, betas: Sequence[float] = (0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.0) -> optax.GradientTransformation:
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps),
        )
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def _adamw(lr: float, betas: Sequence[float] = (0.9, 0.999), eps: float = 1e-8,
           weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


def _rmsprop(lr: float, alpha: float = 0.99, eps: float = 1e-8,
             momentum: float = 0.0, weight_decay: float = 0.0) -> optax.GradientTransformation:
    if isinstance(momentum, (int, float)) and not momentum:
        momentum = None  # injected momentum is a jnp scalar — keep it
    tx = optax.rmsprop(lr, decay=alpha, eps=eps, momentum=momentum)
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


OPTIMIZER_REGISTRY: Dict[str, Callable[..., optax.GradientTransformation]] = {
    "torch.optim.SGD": _sgd,
    "torch.optim.Adam": _adam,
    "torch.optim.AdamW": _adamw,
    "torch.optim.RMSprop": _rmsprop,
    "optax.sgd": _sgd,
    "optax.adam": _adam,
    "optax.adamw": _adamw,
    "SGD": _sgd,
    "Adam": _adam,
    "AdamW": _adamw,
    "RMSprop": _rmsprop,
}


def build_optimizer(
    class_name: str,
    params: Optional[Mapping[str, Any]] = None,
    *,
    flatten: bool = False,
) -> optax.GradientTransformation:
    """Resolve an optimizer config (``hparams.yaml:63-68`` shape) to an optax
    transform with an injectable ``learning_rate`` hyperparameter.

    ``flatten=True`` wraps the inner transform in :func:`optax.flatten`, so
    the update math runs over ONE raveled vector instead of one kernel chain
    per param leaf (~160 leaves for R50-FPN). Measured on the v5e at the
    default train config (bs8, 800x1344): per-leaf 140.1 ms/step vs
    flattened 144.7 ms/step — XLA already fuses the per-leaf SGD chains,
    and the ravel/concat adds HBM traffic, so this stays OPT-IN and off by
    default. The optimizer state then stores a flat momentum vector:
    checkpoints are not interchangeable between flatten modes.
    """
    if class_name not in OPTIMIZER_REGISTRY:
        raise KeyError(
            f"unknown optimizer {class_name!r}; available: {sorted(OPTIMIZER_REGISTRY)}"
        )
    kwargs = dict(params or {})
    lr = kwargs.pop("lr", kwargs.pop("learning_rate", 1e-3))
    factory = OPTIMIZER_REGISTRY[class_name]

    def wrap(tx: optax.GradientTransformation) -> optax.GradientTransformation:
        return optax.flatten(tx) if flatten else tx

    momentum = kwargs.get("momentum")
    if momentum:
        # Expose momentum as a second injectable hyperparameter so schedulers
        # that cycle it (torch OneCycleLR with cycle_momentum=True) can write
        # it between steps exactly like the LR — torch parity for
        # lr_scheduler momentum cycling (reference demo uses SGD+momentum).
        kwargs.pop("momentum")

        def make(learning_rate: float, momentum: float) -> optax.GradientTransformation:
            return wrap(factory(learning_rate, momentum=momentum, **kwargs))

        return optax.inject_hyperparams(make)(learning_rate=lr, momentum=momentum)

    def make(learning_rate: float) -> optax.GradientTransformation:
        return wrap(factory(learning_rate, **kwargs))

    return optax.inject_hyperparams(make)(learning_rate=lr)


def wrap_accumulation(
    tx: optax.GradientTransformation,
    every: int,
    clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Gradient accumulation (pl.Trainer ``accumulate_grad_batches=N`` parity,
    reference README.md:42-59's Trainer surface): average gradients over
    ``every`` consecutive micro-batches and apply ``tx`` once per window.

    ``clip_norm`` clips the ACCUMULATED (mean) gradients at optimizer-step
    time — Lightning clips in ``optimizer_step`` after the accumulation
    window closes, not per micro-batch, so the clip must live INSIDE the
    accumulating wrapper. Built on :class:`optax.MultiSteps`; the optimizer
    state gains one params-sized gradient buffer, so checkpoints are not
    interchangeable between different accumulation settings. The chain is
    built UNCONDITIONALLY (``optax.identity`` when ``clip_norm`` is unset,
    same ``EmptyState`` as the clip) so toggling ``gradient_clip_val``
    between save and resume cannot change the opt_state pytree structure.
    """
    if every <= 1:
        raise ValueError(f"accumulation window must be >= 2, got {every}")
    clip = (
        optax.clip_by_global_norm(clip_norm) if clip_norm else optax.identity()
    )
    ms = optax.MultiSteps(optax.chain(clip, tx), every_k_schedule=every)
    return optax.GradientTransformation(ms.init, ms.update)


def _hyperparams_state(opt_state):
    """Locate the inject_hyperparams state inside a (possibly wrapped)
    optimizer state: MultiSteps nests it under ``inner_opt_state`` and
    optax.chain under a plain state tuple."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if hasattr(opt_state, "inner_opt_state"):
        return _hyperparams_state(opt_state.inner_opt_state)
    if isinstance(opt_state, (tuple, list)) and not hasattr(opt_state, "_fields"):
        for sub in opt_state:
            found = _hyperparams_state(sub)
            if found is not None:
                return found
    return None


def _require_hyperparams(opt_state):
    hp = _hyperparams_state(opt_state)
    if hp is None:
        raise TypeError(
            "optimizer state has no inject_hyperparams layer — build it with "
            "build_optimizer (optionally wrapped by wrap_accumulation)"
        )
    return hp


def set_learning_rate(opt_state, lr: float):
    """Write a new LR into an inject_hyperparams optimizer state (host-side,
    between steps — the hyperparams dict is part of the optimizer pytree).
    Sees through MultiSteps/chain wrappers (:func:`wrap_accumulation`)."""
    import jax.numpy as jnp

    hp = _require_hyperparams(opt_state)
    cur = hp.hyperparams["learning_rate"]
    hp.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=getattr(cur, "dtype", jnp.float32)
    )
    return opt_state


def current_learning_rate(opt_state) -> float:
    return float(_require_hyperparams(opt_state).hyperparams["learning_rate"])


def set_momentum(opt_state, momentum: float):
    """Write a new momentum into the optimizer state (no-op for optimizers
    built without an injectable momentum — e.g. momentum=0 SGD, Adam)."""
    import jax.numpy as jnp

    hp = _require_hyperparams(opt_state)
    if "momentum" not in hp.hyperparams:
        return opt_state
    cur = hp.hyperparams["momentum"]
    hp.hyperparams["momentum"] = jnp.asarray(
        momentum, dtype=getattr(cur, "dtype", jnp.float32)
    )
    return opt_state


# --------------------------------------------------------------------------- #
# LR schedulers (torch.optim.lr_scheduler parity, host-side state)
# --------------------------------------------------------------------------- #
SCHEDULER_STATE_VERSION = 1


class LRScheduler:
    """Base: produces an absolute LR from the step/epoch counter + metric."""

    needs_metric = False

    def __init__(self, base_lr: float):
        self.base_lr = base_lr
        self.t = 0

    def step(self, metric: Optional[float] = None) -> float:
        self.t += 1
        return self.lr_at(self.t)

    # -- checkpoint surface (torch lr_scheduler.state_dict parity) -------- #
    def state_dict(self) -> Dict[str, Any]:
        """Versioned snapshot of the scheduler's host state (torch parity:
        ``scheduler.state_dict()`` is every non-callable attribute — LambdaLR
        excludes its ``lr_lambda`` exactly like torch does). The schema
        version + class name let :meth:`load_state_dict` fail loudly on a
        mismatched restore instead of silently mis-restoring (reference
        scheduler config surface: ``/root/reference/model.py:85-90``)."""
        state = {k: v for k, v in self.__dict__.items() if not callable(v)}
        return {
            "version": SCHEDULER_STATE_VERSION,
            "class": type(self).__name__,
            "state": state,
        }

    def load_state_dict(self, sd: Mapping[str, Any]) -> None:
        """Strict restore: raises on schema-version, class, or attribute-set
        mismatch (a scheduler that gained/renamed state between versions must
        not restore a stale snapshot into the wrong slots)."""
        if not isinstance(sd, Mapping) or "state" not in sd:
            raise ValueError(
                "scheduler checkpoint is not a state_dict() snapshot "
                f"(got {type(sd).__name__}); expected keys version/class/state"
            )
        if sd.get("version") != SCHEDULER_STATE_VERSION:
            raise ValueError(
                f"scheduler checkpoint schema version {sd.get('version')!r} "
                f"!= supported {SCHEDULER_STATE_VERSION} — re-save the "
                "checkpoint with this framework version"
            )
        if sd.get("class") != type(self).__name__:
            raise ValueError(
                f"scheduler checkpoint was saved by {sd.get('class')!r} but "
                f"is being restored into {type(self).__name__!r} — the run "
                "config's scheduler must match the checkpoint's"
            )
        current = {k for k, v in self.__dict__.items() if not callable(v)}
        saved = set(sd["state"])
        if saved != current:
            raise ValueError(
                f"scheduler state keys do not match {type(self).__name__}: "
                f"checkpoint is missing {sorted(current - saved)}, has "
                f"unexpected {sorted(saved - current)} — the scheduler's "
                "state changed between save and restore"
            )
        self.__dict__.update(sd["state"])

    def lr_at(self, t: int) -> float:  # pragma: no cover
        raise NotImplementedError

    def initial_lr(self) -> float:
        """LR before the first step (torch applies lr_at(0) at construction —
        schedulers like OneCycleLR start far below the configured max)."""
        return self.base_lr

    def momentum_at(self, t: int) -> Optional[float]:
        """Momentum override at step t; None for non-cycling schedulers."""
        return None


class ConstantLR(LRScheduler):
    def lr_at(self, t: int) -> float:
        return self.base_lr


class CosineAnnealingLR(LRScheduler):
    """torch.optim.lr_scheduler.CosineAnnealingLR (used by the reference demo)."""

    def __init__(self, base_lr: float, T_max: int, eta_min: float = 0.0):
        super().__init__(base_lr)
        self.T_max = T_max
        self.eta_min = eta_min

    def lr_at(self, t: int) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * min(t, self.T_max) / self.T_max)
        ) / 2


class StepLR(LRScheduler):
    def __init__(self, base_lr: float, step_size: int, gamma: float = 0.1):
        super().__init__(base_lr)
        self.step_size = step_size
        self.gamma = gamma

    def lr_at(self, t: int) -> float:
        return self.base_lr * self.gamma ** (t // self.step_size)


class MultiStepLR(LRScheduler):
    def __init__(self, base_lr: float, milestones: Sequence[int], gamma: float = 0.1):
        super().__init__(base_lr)
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def lr_at(self, t: int) -> float:
        k = sum(1 for m in self.milestones if m <= t)
        return self.base_lr * self.gamma**k


class ReduceLROnPlateau(LRScheduler):
    """torch.optim.lr_scheduler.ReduceLROnPlateau — the reference's default
    scheduler (``hparams.yaml:70-82``), driven by the monitored metric."""

    needs_metric = True

    def __init__(
        self,
        base_lr: float,
        mode: str = "min",
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
        cooldown: int = 0,
        **torch_only,  # verbose / threshold_mode / eps — accepted, ignored
    ):
        super().__init__(base_lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.cooldown = cooldown
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.cooldown_left = 0
        self.lr = base_lr

    def _improved(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best - self.threshold
        return metric > self.best + self.threshold

    def step(self, metric: Optional[float] = None) -> float:
        self.t += 1
        if metric is None:
            return self.lr
        if self._improved(metric):
            self.best = metric
            self.bad_epochs = 0
        elif self.cooldown_left > 0:
            self.cooldown_left -= 1
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
                self.cooldown_left = self.cooldown
        return self.lr


class LambdaLR(LRScheduler):
    """torch.optim.lr_scheduler.LambdaLR: lr = base_lr * lr_lambda(t).

    ``lr_lambda`` must be a callable (YAML can't express one — this surface
    exists for user code that builds schedulers directly, matching the
    reference's arbitrary-scheduler support via load_obj)."""

    def __init__(self, base_lr: float, lr_lambda: Callable[[int], float]):
        super().__init__(base_lr)
        if not callable(lr_lambda):
            raise TypeError("LambdaLR requires a callable lr_lambda")
        self.lr_lambda = lr_lambda

    def lr_at(self, t: int) -> float:
        return self.base_lr * self.lr_lambda(t)

    def initial_lr(self) -> float:
        return self.lr_at(0)


class ExponentialLR(LRScheduler):
    """torch.optim.lr_scheduler.ExponentialLR: lr = base_lr * gamma^t."""

    def __init__(self, base_lr: float, gamma: float):
        super().__init__(base_lr)
        self.gamma = gamma

    def lr_at(self, t: int) -> float:
        return self.base_lr * self.gamma**t


class LinearLR(LRScheduler):
    """torch.optim.lr_scheduler.LinearLR: linear factor ramp
    start_factor → end_factor over total_iters steps."""

    def __init__(
        self,
        base_lr: float,
        start_factor: float = 1.0 / 3.0,
        end_factor: float = 1.0,
        total_iters: int = 5,
    ):
        super().__init__(base_lr)
        self.start_factor = start_factor
        self.end_factor = end_factor
        self.total_iters = total_iters

    def lr_at(self, t: int) -> float:
        frac = min(t, self.total_iters) / self.total_iters
        return self.base_lr * (
            self.start_factor + (self.end_factor - self.start_factor) * frac
        )

    def initial_lr(self) -> float:
        return self.lr_at(0)


class CosineAnnealingWarmRestarts(LRScheduler):
    """torch.optim.lr_scheduler.CosineAnnealingWarmRestarts (SGDR): cosine
    cycles of length T_0, T_0*T_mult, T_0*T_mult^2, ..."""

    def __init__(
        self, base_lr: float, T_0: int, T_mult: int = 1, eta_min: float = 0.0
    ):
        super().__init__(base_lr)
        if T_0 <= 0 or T_mult < 1:
            raise ValueError("T_0 must be > 0 and T_mult >= 1")
        self.T_0 = T_0
        self.T_mult = T_mult
        self.eta_min = eta_min

    def lr_at(self, t: int) -> float:
        # locate (cycle length T_i, position T_cur) — torch's closed form
        if self.T_mult == 1:
            T_i, T_cur = self.T_0, t % self.T_0
        else:
            n = int(
                math.log(t * (self.T_mult - 1) / self.T_0 + 1, self.T_mult)
            )
            T_i = self.T_0 * self.T_mult**n
            T_cur = t - self.T_0 * (self.T_mult**n - 1) // (self.T_mult - 1)
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * T_cur / T_i)
        ) / 2


class OneCycleLR(LRScheduler):
    """torch.optim.lr_scheduler.OneCycleLR (cosine strategy): ramp
    max_lr/div_factor → max_lr over pct_start of total_steps, then anneal to
    max_lr/(div_factor*final_div_factor). Step-interval scheduler — configure
    with ``interval: step``. Momentum cycles INVERSELY to the LR
    (max_momentum → base_momentum → max_momentum) when ``cycle_momentum``,
    exactly like torch; the Trainer writes it into the optimizer's injected
    momentum hyperparameter each scheduler step."""

    def __init__(
        self,
        base_lr: float,
        max_lr: float,
        total_steps: int,
        pct_start: float = 0.3,
        anneal_strategy: str = "cos",
        div_factor: float = 25.0,
        final_div_factor: float = 1e4,
        cycle_momentum: bool = True,
        base_momentum: float = 0.85,
        max_momentum: float = 0.95,
        **torch_only,  # three_phase
    ):
        super().__init__(base_lr)
        if anneal_strategy not in ("cos", "linear"):
            raise ValueError(f"unknown anneal_strategy {anneal_strategy!r}")
        self.max_lr = max_lr
        self.total_steps = total_steps
        self.pct_start = pct_start
        self.anneal_strategy = anneal_strategy
        self.init_lr = max_lr / div_factor
        self.min_lr = self.init_lr / final_div_factor
        self.cycle_momentum = cycle_momentum
        self.base_momentum = base_momentum
        self.max_momentum = max_momentum

    def _anneal(self, start: float, end: float, frac: float) -> float:
        if self.anneal_strategy == "cos":
            return end + (start - end) * (1 + math.cos(math.pi * frac)) / 2
        return start + (end - start) * frac

    def lr_at(self, t: int) -> float:
        t = min(t, self.total_steps)
        up_steps = float(self.pct_start * self.total_steps) - 1
        # Degenerate up phase (pct_start*total_steps <= 1): no up steps
        # exist, so t=0 starts at the down phase's peak instead of
        # dividing 0/0 (found by review: momentum_at(0) is called
        # unconditionally at fit() setup).
        if up_steps > 0 and t <= up_steps:
            return self._anneal(self.init_lr, self.max_lr, t / up_steps)
        up_steps = max(up_steps, 0.0)
        down_steps = self.total_steps - up_steps - 1
        return self._anneal(self.max_lr, self.min_lr, (t - up_steps) / down_steps)

    def initial_lr(self) -> float:
        return self.init_lr

    def momentum_at(self, t: int) -> Optional[float]:
        """torch OneCycleLR momentum cycling: anneal max→base over the LR's
        up phase, base→max over the down phase (inverse of the LR)."""
        if not self.cycle_momentum:
            return None
        t = min(t, self.total_steps)
        up_steps = float(self.pct_start * self.total_steps) - 1
        if up_steps > 0 and t <= up_steps:
            return self._anneal(self.max_momentum, self.base_momentum, t / up_steps)
        up_steps = max(up_steps, 0.0)  # degenerate up phase, see lr_at
        down_steps = self.total_steps - up_steps - 1
        return self._anneal(
            self.base_momentum, self.max_momentum, (t - up_steps) / down_steps
        )


def warmup_scale(step: int, warmup_steps: int, warmup_factor: float) -> float:
    """Linear LR warmup multiplier (reference warmup_lr_scheduler,
    utils/coco/detection_utils.py:237-244: factor -> 1 over warmup_steps).

    RetinaNet training diverges without it: random-init heads produce huge
    box-regression gradients in the first few hundred steps (the Focal Loss
    paper and torchvision both warm up)."""
    if warmup_steps <= 0 or step >= warmup_steps:
        return 1.0
    alpha = step / warmup_steps
    return warmup_factor * (1.0 - alpha) + alpha


SCHEDULER_REGISTRY: Dict[str, type] = {}
for _name, _cls in {
    "CosineAnnealingLR": CosineAnnealingLR,
    "CosineAnnealingWarmRestarts": CosineAnnealingWarmRestarts,
    "StepLR": StepLR,
    "MultiStepLR": MultiStepLR,
    "ReduceLROnPlateau": ReduceLROnPlateau,
    "ConstantLR": ConstantLR,
    "LambdaLR": LambdaLR,
    "ExponentialLR": ExponentialLR,
    "LinearLR": LinearLR,
    "OneCycleLR": OneCycleLR,
}.items():
    SCHEDULER_REGISTRY[_name] = _cls
    SCHEDULER_REGISTRY[f"torch.optim.lr_scheduler.{_name}"] = _cls


def build_scheduler(
    class_name: Optional[str],
    base_lr: float,
    params: Optional[Mapping[str, Any]] = None,
) -> LRScheduler:
    """Resolve a scheduler config (``hparams.yaml:70-82`` shape)."""
    if not class_name:
        return ConstantLR(base_lr)
    if class_name not in SCHEDULER_REGISTRY:
        raise KeyError(
            f"unknown scheduler {class_name!r}; available: {sorted(SCHEDULER_REGISTRY)}"
        )
    kwargs = dict(params or {})
    # torch-only knobs that appear in reference configs (hparams.yaml:74-77)
    # but have no behavioral counterpart here.
    for torch_only in ("verbose", "threshold_mode", "eps", "last_epoch"):
        kwargs.pop(torch_only, None)
    return SCHEDULER_REGISTRY[class_name](base_lr, **kwargs)
