"""Jitted training loop.

One XLA program per step fuses: on-device STFT feature extraction, model
forward, vectorized PIT loss, backward, global-norm clipping, and the
optimizer update — replacing the reference's python-per-step pipeline
(css/trainer/iteration_types.py:17-64). bf16 model compute is opt-in per
model (compute_dtype); no loss scaling is needed on TPU (the reference's
fp16 GradScaler path, iteration_types.py:28-30, has no bf16 analogue).

Non-finite protection: a step whose gradients are non-finite applies a
zero update instead (stronger than the reference, which only skips
checkpointing NaN epochs, train.py:313).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from css_tpu.ops.features import FeatureExtractor
from css_tpu.trainer.lr_schedule import LRSchedule


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def training_rng(seed: int, impl: str = "rbg"):
    """Root PRNG key for training.

    Defaults to the 'rbg' generator: dropout random bits with the default
    threefry cost ~28% of a Conformer-large train step on v5e (measured
    43 -> 31 ms); rbg generates on-chip at a fraction of that. Pass
    impl='threefry2x32' for bit-exact reproducibility across backends.
    """
    return jax.random.key(seed, impl=impl)


def make_optimizer(name: str, schedule: LRSchedule, weight_decay: float = 0.0,
                   grad_thresh: float = 30.0) -> optax.GradientTransformation:
    """sgd | adam with clip-by-global-norm and the 3-phase schedule.

    Matches the reference exactly (scripts/python/train.py:207-212):
    SGD(momentum=0) or Adam(weight_decay) — torch Adam's weight_decay is L2
    added to the gradient BEFORE the Adam scaling, hence add_decayed_weights
    precedes scale_by_adam (NOT decoupled adamw).
    """
    parts = [optax.clip_by_global_norm(grad_thresh)]
    if name == "adam":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam())
    elif name != "sgd":
        raise ValueError(f"unknown optimizer {name!r}")
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


class Trainer:
    """Builds and runs the jitted train/eval steps for one model+objective."""

    def __init__(
        self,
        model,
        objective,
        schedule: LRSchedule,
        optim: str = "adam",
        weight_decay: float = 0.0,
        grad_thresh: float = 30.0,
        input_domain: str = "stft",  # "stft" | "time"
        frame_len: int = 512,
        frame_hop: int = 256,
        donate: bool = True,
        ipd_index: str = None,
    ):
        self.model = model
        self.objective = objective
        self.schedule = schedule
        self.tx = make_optimizer(optim, schedule, weight_decay, grad_thresh)
        self.input_domain = input_domain
        # ipd_index enables MULTICHANNEL training batches (B, C, N): the
        # model input becomes [raw ch0 magnitude, IPD pairs]. The model's
        # internal MVN (idempotent) makes this bit-equivalent to the
        # executor's [MVN magnitude, IPD] features, while keeping
        # y_pred = masks * RAW ch0 magnitude for the loss.
        self.features = FeatureExtractor(frame_len, frame_hop,
                                         ipd_index=ipd_index)
        self._train_step = jax.jit(
            self._train_step_impl, donate_argnums=(0,) if donate else ())
        self._train_multi = jax.jit(
            self._train_multi_impl, donate_argnums=(0,) if donate else ())
        self._eval_step = jax.jit(self._eval_step_impl)

    # ---------------------------------------------------------------- setup
    def init_state(self, rng, example_batch, pools=None) -> TrainState:
        example_batch = {
            k: v for k, v in example_batch.items()
            if k == "mix" or (k.startswith("source") and k[6:].isdigit())
            or k.startswith("dm_")}

        # jit the whole init: eager per-op dispatch is pathological on
        # remote/tunneled TPU backends
        @jax.jit
        def init_fn(rng, batch, pools):
            feats = self._featurize(batch, pools)
            return self.model.init(
                {"params": rng, "dropout": rng}, feats["input"], train=True)

        variables = init_fn(rng, jax.tree.map(jnp.asarray, example_batch),
                            pools)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=batch_stats, opt_state=opt_state)

    def state_from_variables(self, variables) -> TrainState:
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=self.tx.init(params))

    # ------------------------------------------------------------- features
    @staticmethod
    def source_keys(batch):
        """source1..sourceK keys in order (K-speaker batches)."""
        keys = [k for k in batch
                if k.startswith("source") and k[6:].isdigit()]
        return sorted(keys, key=lambda k: int(k[6:]))

    def _featurize(self, batch, pools=None) -> Dict[str, jax.Array]:
        """Raw waveforms -> model inputs + objective targets (on device).

        Encoded mixing recipes (device-mix mode) are materialized into
        waveforms on-chip first; `pools` are the device-resident audio
        pools from `DeviceMixer.device_pools()`.
        """
        if "dm_i" in batch:
            from css_tpu.data.device_mixer import materialize

            batch = materialize(pools, batch)
        src = self.source_keys(batch)
        if self.input_domain == "time":
            return {"input": batch["mix"], **{k: batch[k] for k in src}}
        # magnitudes are loss inputs/targets only, so no VJP is needed
        # through the STFT
        from css_tpu.ops.stft import stft_mag

        fl, fh = self.features.frame_len, self.features.frame_hop
        if batch["mix"].ndim == 3:  # (B, C, N) multichannel (7ch training)
            if self.features.ipd_left is None:
                raise ValueError(
                    "multichannel batches need Trainer(ipd_index=...)")
            from css_tpu.ops import stft as stft_ops
            from css_tpu.ops.features import ipd

            spec = stft_ops.stft(batch["mix"], fl, fh)  # (B, C, T, F) complex
            mag0 = jnp.abs(spec[:, 0])
            phase = jnp.arctan2(spec.imag, spec.real)
            ip = ipd(phase, self.features.ipd_left, self.features.ipd_right)
            bsz, m, t, fbins = ip.shape
            ip = jnp.transpose(ip, (0, 2, 1, 3)).reshape(bsz, t, m * fbins)
            out = {"input": jnp.concatenate([mag0, ip], axis=-1)}
            if getattr(self.objective, "needs_waveforms", False):
                out["mix_wav"] = batch["mix"][:, 0]
                for k in src:
                    out[k] = batch[k]
                return out
            for k in src:
                out[k] = stft_mag(batch[k], fl, fh)
            return out
        if getattr(self.objective, "needs_waveforms", False):
            # resynthesis objectives (MaskSNR) differentiate through their
            # own STFT/iSTFT — hand them the raw waveforms instead of mags
            out = {"input": stft_mag(batch["mix"], fl, fh),
                   "mix_wav": batch["mix"]}
            for k in src:
                out[k] = batch[k]
            return out
        cf = (int(getattr(self.objective, "consistency_frames", 0))
              if getattr(self.objective, "consistency_weight", 0.0) else 0)
        if cf and batch["mix"].shape[-1] > 2 * cf * fh + fl:
            # consistency pair: two crops of the same window offset by cf
            # frames — their shared STFT frames are IDENTICAL samples, so
            # any mask disagreement is pure per-window MVN/context edge
            # effect (the measured cross-window inconsistency source).
            # One stacked forward (2B); targets crop like x1
            shift = cf * fh
            wav = batch["mix"]
            x1 = wav[:, : wav.shape[-1] - shift]
            x2 = wav[:, shift:]
            out = {"input": stft_mag(jnp.concatenate([x1, x2], axis=0),
                                     fl, fh)}
            for k in src:
                out[k] = stft_mag(batch[k][:, : wav.shape[-1] - shift],
                                  fl, fh)
            return out
        out = {"input": stft_mag(batch["mix"], fl, fh)}
        for k in src:
            out[k] = stft_mag(batch[k], fl, fh)
        return out

    # ----------------------------------------------------------------- step
    def _loss_fn(self, params, batch_stats, feats, rng, train: bool):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = self.model.apply(
            variables, feats["input"], train=train,
            rngs={"dropout": rng} if train else None,
            mutable=["batch_stats"] if (train and batch_stats) else False)
        new_stats = batch_stats
        if train and batch_stats:
            out, updates = out
            new_stats = updates.get("batch_stats", batch_stats)
        loss, aux = self.objective(out, feats)
        return loss, (aux, new_stats)

    def _train_step_impl(self, state: TrainState, batch, rng, pools=None):
        # derive the per-step dropout key INSIDE the program: callers pass
        # one fixed epoch key and the step counter provides freshness, so
        # the host never dispatches a per-step jax.random.split (a separate
        # tiny device program per step — measurable over remote backends)
        rng = jax.random.fold_in(rng, state.step)
        feats = self._featurize(batch, pools)
        grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
        (loss, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, feats, rng, True)
        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # non-finite step -> keep everything unchanged
        new_params, new_opt, new_stats = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            (new_params, new_opt, new_stats),
            (state.params, state.opt_state, state.batch_stats),
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "lr": self.schedule(state.step),
            "finite": finite,
        }
        for k, v in aux.items():
            if k != "perms":
                metrics[k] = v
        return (
            TrainState(step=state.step + 1, params=new_params,
                       batch_stats=new_stats, opt_state=new_opt),
            metrics,
        )

    def _train_multi_impl(self, state: TrainState, batches, rng, pools=None):
        """G train steps in ONE device program (lax.scan over the leading
        axis of stacked batches).

        Amortizes per-program dispatch latency by 1/G — on hosts where a
        jit dispatch costs milliseconds (tunneled/remote backends, busy
        Python mains) this is the difference between dispatch-bound and
        chip-bound training. Per-step dropout freshness is preserved:
        `_train_step_impl` folds the (incrementing) step counter into the
        epoch key inside the scan body.
        """
        def body(s, b):
            return self._train_step_impl(s, b, rng, pools)

        return jax.lax.scan(body, state, batches)

    def _eval_step_impl(self, state: TrainState, batch, pools=None):
        feats = self._featurize(batch, pools)
        loss, (aux, _) = self._loss_fn(
            state.params, state.batch_stats, feats,
            jax.random.PRNGKey(0), False)
        return loss

    # ---------------------------------------------------------------- loops
    @staticmethod
    def _stack_group(group):
        """Stack same-shape batch dicts along a new leading axis.

        Host (numpy) batches stack on the host so the device sees ONE
        transfer per group; device-staged batches stack with one tiny
        device program. Returns None when keys/shapes differ (caller
        falls back to single-step dispatch).
        """
        keys = group[0].keys()
        if any(b.keys() != keys for b in group[1:]):
            return None
        for k in keys:
            shape = group[0][k].shape
            if any(b[k].shape != shape for b in group[1:]):
                return None
        out = {}
        for k in keys:
            parts = [b[k] for b in group]
            if all(isinstance(p, np.ndarray) for p in parts):
                out[k] = np.stack(parts)
            else:
                out[k] = jnp.stack([jnp.asarray(p) for p in parts])
        return out

    @staticmethod
    def _batch_geometry(batch):
        """(batch_size, window_samples) for audio AND encoded-recipe
        batches. Multichannel audio is (B, C, N) — the window length is
        always the LAST axis."""
        if "mix" in batch:
            return batch["mix"].shape[0], batch["mix"].shape[-1]
        return batch["dm_i"].shape[0], batch["dm_winmark"].shape[-1]

    def train_one_epoch(self, state: TrainState, loader, batches_per_epoch: int,
                        rng, log_fn: Optional[Callable] = None,
                        sr: int = 16000, log_every: int = 50,
                        steps_per_dispatch: int = 1, pools=None):
        """Fixed-size epoch (train.py:92 batches-per-epoch semantics).

        Returns (state, avg_loss). Fully asynchronous: per-step metrics
        stay on device and the host only synchronizes every ``log_every``
        steps, so XLA's async dispatch pipelines step N+1 while step N
        runs. With ``steps_per_dispatch`` G > 1, G consecutive same-shape
        batches are stacked and run as ONE scanned device program
        (`_train_multi_impl`), amortizing per-dispatch latency by 1/G —
        pair it with the mixer's matching ``window_group`` so groups share
        a window bucket. A trailing remainder (or a shape change inside a
        group) falls back to single-step dispatch. The logged
        audio-seconds/sec/chip is measured over each log interval.

        ``rng`` is a fixed per-epoch key; each step derives its own dropout
        key inside the compiled program (fold_in of the step counter), so
        G=1 and G>1 runs are step-for-step identical.
        """
        n_dev = max(jax.device_count(), 1)
        g_max = max(int(steps_per_dispatch), 1)
        it = iter(loader)
        loss_scalars, loss_chunks = [], []
        t_interval = time.perf_counter()
        interval_audio = 0.0
        done = 0
        next_log = log_every
        pending = None  # batch held over from a shape change mid-group
        while done < batches_per_epoch:
            g = min(g_max, batches_per_epoch - done)
            group, ovls = [], []
            # pull the MAXIMAL same-geometry run (up to g): fixed-count
            # chunking would permanently straddle the loader's same-shape
            # runs after any desync (a consumed example batch, a loader
            # fallback), downgrading every group to per-step dispatch
            while len(group) < g:
                if pending is not None:
                    batch, ovl = pending
                    pending = None
                else:
                    batch = next(it)
                    ovl = batch.pop("ovl", None)
                    batch.pop("lens", None)
                if group and (self._batch_geometry(batch)
                              != self._batch_geometry(group[0])):
                    pending = (batch, ovl)
                    break
                group.append(batch)
                ovls.append(ovl)
            g = len(group)
            # only full-size groups get the scanned program: each distinct
            # group length g would compile its OWN program per window
            # bucket (epoch boundaries split the loader's 16-runs into
            # arbitrary 2..15 remainders — measured as an hours-long
            # compile tail over a tunneled backend). Quantizing dispatch
            # sizes to {G, 1} caps the program zoo at 2 per bucket; the
            # ≤G-1 per-step dispatches per epoch boundary cost ~0.2 s
            stacked = self._stack_group(group) if g == g_max else None
            if stacked is not None:
                state, metrics = self._train_multi(state, stacked, rng, pools)
                loss_chunks.append(metrics["loss"])  # (g,) device, no sync
            else:
                for batch in group:
                    state, metrics = self._train_step(state, batch, rng, pools)
                    loss_scalars.append(metrics["loss"])  # device, no sync
            done += g
            bsize = self._batch_geometry(group[-1])[0]
            interval_audio += sum(
                b * n for b, n in map(self._batch_geometry, group)) / sr
            if log_fn is not None and (done >= next_log
                                       or done == batches_per_epoch):
                m = jax.device_get(metrics)  # sync: device caught up to here
                last = {k: np.asarray(v).reshape(-1)[-1]
                        for k, v in m.items()}  # last step of the group
                dt = time.perf_counter() - t_interval
                log = {
                    "iter": done,
                    "loss": float(last["loss"]),
                    "grad_norm": float(last["grad_norm"]),
                    "lr": float(last["lr"]),
                    "bsize": int(bsize),
                    "audio_sec_per_sec_per_chip": interval_audio / dt / n_dev,
                }
                if ovls[-1] is not None:
                    log["ovl"] = float(ovls[-1])
                log_fn(log)
                t_interval = time.perf_counter()
                interval_audio = 0.0
                while next_log <= done:
                    next_log += log_every
        total = 0.0
        if loss_scalars:
            total += float(jnp.sum(jnp.stack(loss_scalars)))
        if loss_chunks:
            total += float(jnp.sum(jnp.concatenate(loss_chunks)))
        return state, total / batches_per_epoch

    def validate(self, state: TrainState, loader, num_batches: int = 100,
                 pools=None):
        """Eval loop (css/trainer/iteration_types.py:67-77)."""
        it = iter(loader)
        losses = []
        for _ in range(num_batches):
            batch = next(it)
            batch.pop("ovl", None)
            batch.pop("lens", None)
            losses.append(self._eval_step(state, batch, pools))  # no per-batch sync
        return float(jnp.mean(jnp.stack(losses)))
