"""Seed-parallel image-game training: many independent games in ONE program.

TPU-native capability with no reference counterpart (the reference trains
one seed per process, ``train_gim_on_imgs.py:164-214``): ``jax.vmap`` over
the pure train step (``train/image.make_train_step_fn``) stacks S complete
game states — both players' params, spectral u/v, Adam moments, PRNG — on
a leading seed axis and advances all S games with one compiled XLA
program.  Adversarial training is seed-noisy (STATUS: the round-2/3
head-to-heads needed n>=3 per implementation), so variance studies are a
first-class workload; the small configs they use leave most of the MXU
idle, and batching the games recovers it.

Under vmap every conv with per-seed kernels lowers to a grouped conv
(feature_group_count*S) and every dense to a batched matmul — the same
HLO node count as one game, so the remote-compile cost does not grow with
S.  LR sweeps ride free when ``cfg.inject_lr`` puts constant LRs in the
optimizer STATE: ``set_injected_lr`` patches a per-seed LR vector into the
stacked state, so one program trains S seeds at S different LRs.

Checkpoints stay interchangeable with single-seed training:
``slice_seed`` extracts an ordinary ``GameState`` (saved per-seed by the
runner, readable by the standard eval CLI), and ``stack_states`` lifts
independently created/restored states back onto the seed axis.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from optimalstrategiesagainstgenerativeattacks_tpu.train.image import (
    create_state,
    make_train_step_fn,
)
from optimalstrategiesagainstgenerativeattacks_tpu.train.state import GameState
from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import ImageGameConfig


def stack_states(states: Sequence[GameState]) -> GameState:
    """Stack S per-seed ``GameState``s on a new leading seed axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def slice_seed(state: GameState, s: int) -> GameState:
    """Extract seed ``s`` as an ordinary single-game ``GameState`` (the
    standard checkpointer/eval CLI contract)."""
    return jax.tree.map(lambda x: x[s], state)


def n_seeds(state: GameState) -> int:
    return int(state.step.shape[0])


def create_multiseed_state(cfg: ImageGameConfig, au, im, seeds: Sequence[int]):
    """Initialise one game per seed (exactly ``create_state`` with
    ``PRNGKey(seed)``, so seed s matches a single-seed run at seed s) and
    stack them. Returns (stacked_state, opt_au, opt_im, scheds)."""
    states = []
    opt_au = opt_im = scheds = None
    for s in seeds:
        st, opt_au, opt_im, scheds = create_state(
            cfg, au, im, jax.random.PRNGKey(int(s))
        )
        states.append(st)
    return stack_states(states), opt_au, opt_im, scheds


def make_multiseed_train_step(cfg: ImageGameConfig, au, im, opt_au, opt_im):
    """jit(vmap(train_step)): advances all S games one step.

    Takes the stacked state (donated) and a batch pytree with a leading
    seed axis ``[S, B, ...]`` — each seed consumes its own batch, matching
    S independent runs with differently-seeded loaders.  Returns
    (stacked_state, metrics ``{name: [S]}``, fake ``[S, B, n, H, W, C]``).

    Single-device by design (variance studies / LR sweeps); the
    multi-device path shards the DATA axis of one game instead
    (``parallel/mesh.py``).  Note ``n_au_steps > 1`` turns the im-phase
    ``lax.cond`` into a select under vmap (both branches execute); the
    gate is step-synchronous across seeds, so prefer the default
    ``n_au_steps == 1`` specialisation here.
    """
    if cfg.n_au_steps > 1:
        import warnings

        warnings.warn(
            f"make_multiseed_train_step with n_au_steps={cfg.n_au_steps}: "
            "under vmap the im-phase lax.cond lowers to a select, so BOTH "
            "branches run every step — each seed pays the full generator "
            "update cost even on authenticator-only steps (~2x im-phase "
            "FLOPs). Prefer n_au_steps=1 here, or run single-seed training.",
            RuntimeWarning,
            stacklevel=2,
        )
    step_fn = make_train_step_fn(cfg, au, im, opt_au, opt_im, mesh=None)
    return jax.jit(jax.vmap(step_fn), donate_argnums=(0,))


def _patch_lr(tree, values: jnp.ndarray, _sentinel=object()):
    """Replace every ``hyperparams['learning_rate']`` leaf under ``tree``
    with the per-seed vector ``values`` (shape [S], matching the stacked
    leaf's leading axis)."""
    n_hits = 0
    # optax names this state InjectHyperparamsState or (newer)
    # InjectStatefulHyperparamsState; match structurally
    inject_names = ("InjectHyperparamsState", "InjectStatefulHyperparamsState")

    def rec(node):
        nonlocal n_hits
        if type(node).__name__ in inject_names:
            hp = dict(node.hyperparams)
            if "learning_rate" in hp:
                hp["learning_rate"] = jnp.broadcast_to(
                    values.astype(jnp.asarray(hp["learning_rate"]).dtype),
                    jnp.shape(hp["learning_rate"]),
                )
                n_hits += 1
            return node._replace(
                hyperparams=hp, inner_state=rec(node.inner_state)
            )
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*(rec(v) for v in node))
        if isinstance(node, (tuple, list)):
            return type(node)(rec(v) for v in node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    out = rec(tree)
    return out, n_hits


def set_injected_lr(state: GameState, player: str, lrs: Sequence[float]) -> GameState:
    """Give each seed its own constant LR: patch the per-seed
    ``learning_rate`` hyperparameter vector inside the stacked optimizer
    state.  Requires ``cfg.inject_lr`` with no milestones (constant LRs
    live in optimizer state, so the compiled program is LR-agnostic).

    ``player``: 'au' patches the authenticator's Adam; 'im' patches the
    impersonator's 'main' group (the separately-scheduled env-noise mapper
    keeps its configured LR).
    """
    values = jnp.asarray(list(lrs), jnp.float32)
    if player == "au":
        patched, hits = _patch_lr(state.opt_au, values)
        if hits == 0:
            raise ValueError("no injected learning_rate found in opt_au "
                             "(set cfg.inject_lr=True, no milestones)")
        return state.replace(opt_au=patched)
    if player == "im":
        # multi_transform state: patch only the 'main' group's inject state
        inner = dict(state.opt_im.inner_states)
        patched, hits = _patch_lr(inner["main"], values)
        if hits == 0:
            raise ValueError("no injected learning_rate found in opt_im['main']")
        inner["main"] = patched
        return state.replace(opt_im=state.opt_im._replace(inner_states=inner))
    raise ValueError(f"player must be 'au' or 'im', got {player!r}")


def stack_batches(batches: Sequence[Dict]) -> Dict:
    """Stack S per-seed batches on the leading seed axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
