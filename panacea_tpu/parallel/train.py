"""Sharded training step.

The reference ships no Trainer (SURVEY.md: inference-only release) but all
training hooks exist; here the full step — conditioning-frozen diffusion loss,
grads, AdamW update, optional EMA — is ONE jitted SPMD program over a
('dp','t') mesh. Frames shard over 't'; XLA inserts the all-to-alls for the
temporal-attention reshapes over ICI. No DDP/NCCL user code (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from panacea_tpu.utils.ema import EmaState, ema_init, ema_update


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema: Optional[EmaState] = None


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-2,
                   trainable_mask=None, grad_clip: Optional[float] = None,
                   spatial_lr_rate: Optional[float] = None,
                   lr_schedule=None):
    """AdamW with optional per-leaf freeze mask (freeze_type='spatial' trains
    only temporal params, diffusion.py:107-110) and optional dual LR groups:
    spatial params at lr*spatial_lr_rate, temporal at lr (the reference's
    instantiate_st_optimizer_from_config, diffusion.py:217-230)."""

    def adamw(rate):
        tx = []
        if grad_clip:
            tx.append(optax.clip_by_global_norm(grad_clip))
        if lr_schedule is not None:
            tx.append(optax.adamw(
                lambda step: rate * lr_schedule(step),
                weight_decay=weight_decay))
        else:
            tx.append(optax.adamw(rate, weight_decay=weight_decay))
        return optax.chain(*tx)

    if spatial_lr_rate is not None and spatial_lr_rate != 1.0:
        def group(path, _):
            if any("temporal" in str(p) for p in path):
                return "temporal"
            return "spatial"

        def labeler(params):
            import flax

            flat = flax.traverse_util.flatten_dict(params)
            lbl = {k: group(k, v) for k, v in flat.items()}
            return flax.traverse_util.unflatten_dict(lbl)

        opt = optax.multi_transform(
            {"spatial": adamw(lr * spatial_lr_rate), "temporal": adamw(lr)},
            labeler,
        )
    else:
        opt = adamw(lr)
    if trainable_mask is not None:
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask),
        )
    return opt


def init_train_state(engine, optimizer, use_ema: bool = False) -> TrainState:
    params = engine.params["model"]
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        ema=ema_init(params) if use_ema else None,
    )


def shard_train_state(mesh: Mesh, state: TrainState, fs_params=None,
                      fsdp: bool = False, fsdp_min_size: int = 65536):
    """Place (state, fs_params) on the mesh: FSDP-sharded or replicated.
    Returns ((state, fs_params), (state_sharding, fs_sharding))."""
    from panacea_tpu.parallel.mesh import fsdp_sharding

    if fsdp:
        state_s = fsdp_sharding(mesh, state, min_size=fsdp_min_size)
        fs_s = (fsdp_sharding(mesh, fs_params, min_size=fsdp_min_size)
                if fs_params is not None else None)
    else:
        repl = NamedSharding(mesh, P())
        state_s = jax.tree.map(lambda _: repl, state)
        fs_s = (jax.tree.map(lambda _: repl, fs_params)
                if fs_params is not None else None)
    state = jax.device_put(state, state_s)
    if fs_params is not None:
        fs_params = jax.device_put(fs_params, fs_s)
    return (state, fs_params), (state_s, fs_s)


def make_train_step(engine, optimizer, mesh: Optional[Mesh] = None,
                    ema_decay: float = 0.9999, donate: bool = True,
                    fsdp: bool = False, fsdp_min_size: int = 65536,
                    shardings=None):
    """Returns jitted ``step(state, fs_params, jpg, cond, rng) -> (state, loss)``.

    With a mesh: jpg sharded (clips over 'dp', frames over 't'), per-clip cond
    over 'dp', per-frame cond over ('dp','t'). Params/opt state are replicated
    by default; ``fsdp=True`` shards them (plus EMA and the frozen first-stage
    tower) over the whole mesh — the ZeRO-3/DeepSpeed-equivalent memory layout
    the reference trained under (panaceaplus_40k_deepspeed.ckpt). XLA inserts
    the param all-gathers and grad reduce-scatters from the annotations alone.

    ``shardings``: the ``(state_sharding, fs_sharding)`` pair returned by
    ``shard_train_state`` — pass it so the jit's in_shardings are exactly the
    layout the state already lives in. Deriving them here instead (fsdp=True
    without ``shardings``) requires ``fsdp_min_size`` to match the value given
    to ``shard_train_state``, or every step silently reshards the full state."""

    def step_fn(state: TrainState, fs_params, jpg, cond, rng):
        from panacea_tpu.parallel import shardctx

        def body():
            def loss_fn(p):
                return engine.train_loss(p, fs_params, jpg, cond, rng)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = state.ema
            if ema is not None:
                ema = ema_update(ema, params, decay=ema_decay)
            return TrainState(params, opt_state, state.step + 1, ema), loss

        # trace-time activation-sharding context: the model's temporal
        # stages pin their layouts (parallel/shardctx.py); no-op mesh=None
        with shardctx.activation_sharding(mesh):
            return body()

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    jpg_s = NamedSharding(mesh, P("dp", "t"))  # (B, T, H, W, C)
    clip_s = NamedSharding(mesh, P("dp"))      # (B, L, D) crossattn
    frame_s = NamedSharding(mesh, P(("dp", "t")))  # (B*T, ...) image-like

    def cond_shardings(cond):
        out = {}
        for k, v in cond.items():
            out[k] = clip_s if k in ("crossattn", "vector") else frame_s
        return out

    cache = {}

    def sharded_step(state, fs_params, jpg, cond, rng):
        key = tuple(sorted(cond.keys()))
        if key not in cache:
            if shardings is not None:
                state_s, fs_s = shardings
            elif fsdp:
                from panacea_tpu.parallel.mesh import fsdp_sharding

                state_s = fsdp_sharding(mesh, state, min_size=fsdp_min_size)
                fs_s = fsdp_sharding(mesh, fs_params,
                                     min_size=fsdp_min_size)
            else:
                state_s = jax.tree.map(lambda _: repl, state)
                fs_s = jax.tree.map(lambda _: repl, fs_params)
            in_shardings = (state_s, fs_s, jpg_s, cond_shardings(cond), repl)
            cache[key] = jax.jit(
                step_fn,
                in_shardings=in_shardings,
                out_shardings=(state_s, repl),
                donate_argnums=(0,) if donate else (),
            )
        return cache[key](state, fs_params, jpg, cond, rng)

    return sharded_step
