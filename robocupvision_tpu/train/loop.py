"""Epoch-level training harness.

Wraps the jitted steps with the loop mechanics every reference entry point
shares (train.py:29-203): shuffled epochs, train metrics, eval with
confusion/IoU, best-checkpoint selection, and pruned-fraction reporting.
Script-specific control flow (decay sweeps, plateau rollback, pruning
iterations) lives in the CLI layer, like the reference's scripts — but the
per-batch path is a single compiled function.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from robocupvision_tpu.data.device_cache import DeviceCache, epoch_batches
from robocupvision_tpu.models.zoo import Model
from robocupvision_tpu.ops.metrics import seg_finalize
from robocupvision_tpu.train import checkpoint as ckpt
from robocupvision_tpu.train import step as tstep


@dataclasses.dataclass
class EpochResult:
    loss: float
    reg: float
    pixel_acc: float
    extra: Dict


class Trainer:
    def __init__(self, model: Model, tx, cfg: tstep.StepCfg,
                 train_cache: Optional[DeviceCache], val_cache: Optional[DeviceCache],
                 batch_size: int, multipliers: Optional[Dict[str, float]] = None,
                 seed: int = 12345678, scan_epochs: bool = True, mesh=None):
        """``mesh``: a parallel.mesh Mesh — dataset caches are sharded over
        the 'data' axis and the train state replicated; XLA inserts the
        gradient psum / sync-BN collectives under jit automatically."""
        self.model = model
        self.cfg = cfg
        self.tx = tx
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_shard = NamedSharding(mesh, P("data"))
            n_data = mesh.shape["data"]

            def _shard_cache(cache: DeviceCache) -> DeviceCache:
                # pad dim 0 to the data-axis size; pad rows are never gathered
                # (permutations/index vectors only cover [0, n))
                pad = (-cache.n) % n_data
                imgs, labs = cache.images, cache.labels
                if pad:
                    imgs = jnp.concatenate(
                        [imgs, jnp.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
                    labs = jnp.concatenate(
                        [labs, jnp.zeros((pad,) + labs.shape[1:], labs.dtype)])
                return DeviceCache(jax.device_put(imgs, data_shard),
                                   jax.device_put(labs, data_shard), cache.n)

            if train_cache is not None:
                train_cache = _shard_cache(train_cache)
            if val_cache is not None:
                val_cache = _shard_cache(val_cache)
        self.train_cache = train_cache
        self.val_cache = val_cache
        self.batch_size = batch_size
        self.multipliers = multipliers
        self._run_fns: Dict = {}
        self.train_step = tstep.make_train_step(model, tx, cfg, multipliers,
                                                donate=False)
        self.eval_step = tstep.make_eval_step(model, cfg)
        self.rng = jax.random.PRNGKey(seed)
        self._seed = seed
        self.state: Optional[tstep.TrainState] = None
        self.scan_epochs = scan_epochs
        self._epoch_fn = None
        self._reducers: Dict[str, Callable] = {}
        self._pruned_frac_fn = None
        if scan_epochs and train_cache is not None and train_cache.n > 0:
            from robocupvision_tpu.data.device_cache import num_batches

            self._n_batches = num_batches(train_cache.n, batch_size)
            self._epoch_fn = tstep.make_epoch_fn(model, tx, cfg, batch_size,
                                                 self._n_batches,
                                                 train_cache.n, multipliers)

    # -- state management ---------------------------------------------------

    def _replicate(self, state: tstep.TrainState) -> tstep.TrainState:
        if self.mesh is None:
            return state
        from robocupvision_tpu.parallel.mesh import replicate_state

        return replicate_state(self.mesh, state)

    def init(self, rng: Optional[jax.Array] = None) -> None:
        self.state = self._replicate(tstep.init_state(
            self.model, self.tx, rng if rng is not None else self.rng))

    def set_params(self, params: Dict[str, np.ndarray],
                   reset_opt: bool = True) -> None:
        dev = {k: jnp.asarray(v) for k, v in params.items()}
        if self.state is None or reset_opt:
            from robocupvision_tpu.models.layers import split_params

            trainable, _ = split_params(dev)
            self.state = self._replicate(
                tstep.TrainState(dev, self.tx.init(trainable)))
        else:
            self.state = self._replicate(
                tstep.TrainState(dev, self.state.opt_state))

    def params_numpy(self) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in self.state.params.items()}

    def _next_rng(self) -> jax.Array:
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def _reduce_pending(self, pending):
        """Tree-sum a list of per-batch metric pytrees in ONE jitted call and
        fetch the scalars in ONE transfer. Fetching the raw list costs a
        round-trip per leaf on remote-dispatch transports (measured ~5 ms
        each over the axon tunnel — 0.6 s/epoch at 32 batches)."""
        if not pending:
            return None
        fn = self._reducers.get("fn")
        if fn is None:
            # one jit object; it re-specializes per pytree structure/length
            fn = jax.jit(lambda outs: jax.tree.map(lambda *xs: sum(xs), *outs))
            self._reducers["fn"] = fn
        return jax.device_get(fn(pending))

    # -- epochs -------------------------------------------------------------

    def train_epoch(self, lr: float,
                    prune_masks: Optional[Dict[str, np.ndarray]] = None
                    ) -> EpochResult:
        assert self.state is not None and self.train_cache is not None
        masks_dev = None
        if prune_masks is not None:
            masks_dev = {k: jnp.asarray(v, jnp.float32)
                         for k, v in prune_masks.items()}
        lr_arr = jnp.float32(lr)
        if self._epoch_fn is not None:
            return self._train_epoch_scan(lr_arr, masks_dev)
        # No host sync inside the epoch: steps dispatch asynchronously and the
        # per-batch metric scalars are fetched in one device_get at the end
        # (a per-batch float() would serialize the device pipeline and cost
        # ~2x wall clock on remote-TPU transports).
        pending = []
        for bi, (bimgs, btgt, bmask) in enumerate(
                epoch_batches(self.train_cache, self.batch_size, self._next_rng())):
            self.state, out = self.train_step(self.state, bimgs, btgt, bmask,
                                              self._next_rng(), lr_arr, masks_dev)
            pending.append(out)
        return self._train_epoch_result(pending)

    def _train_epoch_result(self, pending) -> EpochResult:
        n_batches = len(pending)
        tot = self._reduce_pending(pending)
        if tot is None:
            return EpochResult(loss=0.0, reg=0.0, pixel_acc=0.0, extra={})
        return EpochResult(
            loss=float(tot["loss"]) / max(n_batches, 1),
            reg=float(tot["reg"]) / max(n_batches, 1),
            pixel_acc=float(tot["correct"]) * self.cfg.out_size * 100.0
            / max(float(tot["img_cnt"]), 1.0),
            extra={})

    def train_epoch_streamed(self, lr: float, dataset, *,
                             shuffle: bool = True, device_transform=None,
                             prune_masks: Optional[Dict[str, np.ndarray]] = None
                             ) -> EpochResult:
        """One epoch fed from a host dataset via the prefetching streaming
        pipeline (data/streaming.py) instead of the HBM cache — for datasets
        exceeding device memory. Host decode overlaps device compute (the
        TPU-native analog of the reference's DataLoader(num_workers=8),
        train.py:295-299); the jitted step is identical to train_epoch's.
        """
        from robocupvision_tpu.data.streaming import StreamingBatches

        assert self.state is not None
        masks_dev = None
        if prune_masks is not None:
            masks_dev = {k: jnp.asarray(v, jnp.float32)
                         for k, v in prune_masks.items()}
        lr_arr = jnp.float32(lr)
        host_rng = None
        if shuffle:
            # host-side generator: no eager device op / RTT per epoch (the
            # jax stream stays untouched; determinism comes from the shared
            # Trainer seed)
            if not hasattr(self, "_host_rng"):
                self._host_rng = np.random.default_rng(self._seed)
            host_rng = self._host_rng
        sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P("data"))
        stream = StreamingBatches(dataset, self.batch_size, host_rng,
                                  sharding=sharding,
                                  device_transform=device_transform,
                                  process_index=jax.process_index(),
                                  process_count=jax.process_count())
        pending = []
        for bimgs, btgt, bmask in stream:
            self.state, out = self.train_step(self.state, bimgs, btgt, bmask,
                                              self._next_rng(), lr_arr,
                                              masks_dev)
            pending.append(out)
        return self._train_epoch_result(pending)

    def _train_epoch_scan(self, lr_arr, masks_dev) -> EpochResult:
        """One device dispatch for the whole epoch (lax.scan over batches;
        shuffle, padding and metric reduction run inside the program)."""
        cache = self.train_cache
        self.state, outs = self._epoch_fn(self.state, cache.images,
                                          cache.labels, self._next_rng(),
                                          lr_arr, masks_dev)
        outs = jax.device_get(outs)
        n_batches = self._n_batches
        return EpochResult(
            loss=float(outs["loss"]) / max(n_batches, 1),
            reg=float(outs["reg"]) / max(n_batches, 1),
            pixel_acc=float(outs["correct"]) * self.cfg.out_size
            * 100.0 / max(float(outs["img_cnt"]), 1.0),
            extra={})

    def train_run(self, epochs: int, lrs,
                  prune_masks: Optional[Dict[str, np.ndarray]] = None,
                  chunk_epochs: Optional[int] = None,
                  on_chunk: Optional[Callable] = None,
                  resume_path: Optional[str] = None):
        """The whole train.py epoch loop (train epochs + per-epoch validation
        + best-model selection) as scanned device dispatches
        (train/step.py make_train_run_fn). ``lrs``: per-epoch LR list
        (precomputed schedule).

        ``chunk_epochs``: dispatch the run in chunks of K epochs, carrying
        best_score/best_params ON DEVICE between chunks. After each chunk,
        that chunk's metrics are fetched and ``on_chunk(epoch_offset,
        chunk_metrics, best_params_or_None)`` fires — best_params (host
        arrays) is non-None iff the chunk improved the best score, so the
        caller can stream per-epoch prints and write a durable checkpoint
        mid-run (reference train.py:197-201 saves on every improvement; a
        single multi-hundred-epoch dispatch killed midway would save
        nothing). None = single dispatch, one fetch (the tunnel-optimal
        mode bench.py measures).

        ``resume_path``: TRUE crash resume (framework extension — the
        reference only warm-starts from best weights). After every chunk
        the full TrainState (params + optimizer state), best carry, rng
        and chunk cursor are snapshotted atomically to this path; if the
        file already exists, the run continues from its cursor and the
        final result is bit-identical to an uninterrupted run. The file is
        NOT deleted on completion (callers decide).

        Returns (best_score, best_params | None, metrics) where metrics is a
        dict of (epochs,)-stacked arrays: train_loss/train_reg/
        train_pixel_acc/val_loss/pixel_acc/mean_class_acc/mean_iou/score/
        conf/(epochs,C,C)/better/pruned. best_params is None when no epoch
        improved on score 0 (the reference saves nothing then)."""
        assert self.state is not None and self.train_cache is not None \
            and self.val_cache is not None
        assert len(lrs) == epochs, (len(lrs), epochs)  # lrs[ei] is clamped
        # inside the scan — a short list would silently reuse the last LR
        masks_dev = None
        if prune_masks is not None:
            masks_dev = {k: jnp.asarray(v, jnp.float32)
                         for k, v in prune_masks.items()}
        assert chunk_epochs is None or chunk_epochs > 0, chunk_epochs
        if chunk_epochs is None or chunk_epochs >= epochs:
            chunks = [epochs]
        else:
            chunks = [chunk_epochs] * (epochs // chunk_epochs)
            if epochs % chunk_epochs:
                chunks.append(epochs % chunk_epochs)

        def run_fn(n_epochs: int):
            # the compiled run bakes dataset sizes, batch size and epoch
            # count in as static constants — key on all of them (callers may
            # swap caches; chunking reuses one executable for equal chunks)
            key = (n_epochs, prune_masks is not None, self.train_cache.n,
                   self.val_cache.n, self.batch_size)
            fn = self._run_fns.get(key)
            if fn is None:
                fn = tstep.make_train_run_fn(
                    self.model, self.tx, self.cfg, self.batch_size,
                    self.train_cache.n, self.batch_size, self.val_cache.n,
                    n_epochs, self.multipliers)
                self._run_fns[key] = fn
            return fn

        carry = None
        start_chunk = 0
        any_better_before = False
        if resume_path is not None:
            import os

            from robocupvision_tpu.models.layers import split_params

            if os.path.exists(resume_path):
                (pr, opt_leaves, bs0, bp0, rng_arr, start_chunk,
                 meta) = ckpt.load_resume(resume_path)
                assert meta["epochs"] == epochs and meta["chunks"] == chunks, \
                    (meta, epochs, chunks)  # resume must match the schedule
                dev = {k: jnp.asarray(v) for k, v in pr.items()}
                trainable, _ = split_params(dev)
                template = self.tx.init(trainable)
                leaves, treedef = jax.tree_util.tree_flatten(template)
                assert len(leaves) == len(opt_leaves), "optimizer mismatch"
                opt_state = jax.tree_util.tree_unflatten(
                    treedef, [jnp.asarray(v) for v in opt_leaves])
                self.state = self._replicate(tstep.TrainState(dev, opt_state))
                self.rng = jnp.asarray(rng_arr)
                carry = (jnp.float32(bs0),
                         {k: jnp.asarray(v) for k, v in bp0.items()})
                any_better_before = bool(meta.get("any_better", False))
        ms_parts = []
        off = sum(chunks[:start_chunk])
        for ci in range(start_chunk, len(chunks)):
            ce = chunks[ci]
            self.state, best_score, best_params, ms = run_fn(ce)(
                self.state, self.train_cache.images, self.train_cache.labels,
                self.val_cache.images, self.val_cache.labels, self._next_rng(),
                jnp.asarray(lrs[off:off + ce], jnp.float32), masks_dev, carry)
            carry = (best_score, best_params)
            ms = jax.device_get(ms)
            ms_parts.append(ms)
            any_better_before = any_better_before or bool(np.any(ms["better"]))
            if resume_path is not None:
                ckpt.save_resume(
                    resume_path, self.params_numpy(),
                    [np.asarray(v) for v in
                     jax.tree_util.tree_leaves(self.state.opt_state)],
                    float(best_score),
                    {k: np.asarray(v) for k, v in best_params.items()},
                    np.asarray(self.rng), ci + 1,
                    {"epochs": epochs, "chunks": chunks,
                     "any_better": any_better_before})
            if on_chunk is not None:
                improved = bool(np.any(ms["better"]))
                on_chunk(off, ms,
                         {k: np.asarray(v) for k, v in best_params.items()}
                         if improved else None)
            off += ce
        if not ms_parts:  # resume file from an already-finished run
            score = float(carry[0])
            bp = {k: np.asarray(v) for k, v in carry[1].items()} \
                if any_better_before else None
            return score, bp, {}
        ms = {k: np.concatenate([m[k] for m in ms_parts])
              for k in ms_parts[0]} if len(ms_parts) > 1 else ms_parts[0]
        score = float(best_score)
        if not any_better_before:
            return score, None, ms
        return score, {k: np.asarray(v) for k, v in best_params.items()}, ms

    def valid_epoch(self) -> Dict:
        assert self.state is not None and self.val_cache is not None
        pending = []
        for bimgs, btgt, bmask in epoch_batches(self.val_cache, self.batch_size,
                                                None):
            out = self.eval_step(self.state.params, bimgs, btgt, bmask)
            out.pop("pred", None)  # not needed for metrics; avoid the transfer
            pending.append(out)
        n_batches = len(pending)
        tot = self._reduce_pending(pending)
        if tot is None:  # empty val cache
            if self.cfg.loss == "ce":
                return {"loss": 0.0, "conf": None, "acc": 0.0}
            return {"loss": 0.0, "conf": None, "pixel_acc": 0.0,
                    "mean_class_acc": 0.0, "mean_iou": 0.0, "score": 0.0}
        tot_loss = float(tot["loss"])
        if self.cfg.loss == "ce":
            return {"loss": tot_loss / max(n_batches, 1),
                    "conf": np.asarray(tot["conf"]),
                    "acc": float(tot["correct"]) * 100.0
                    / max(float(tot["img_cnt"]), 1.0)}
        acc = tot["acc"]
        fin = seg_finalize(acc, self.cfg.out_size)
        fin = {k: (np.asarray(v) if hasattr(v, "shape") else v)
               for k, v in fin.items()}
        fin["loss"] = tot_loss / max(n_batches, 1)
        for k in ("pixel_acc", "mean_class_acc", "mean_iou", "score"):
            fin[k] = float(fin[k])
        return fin

    def pruned_fraction(self) -> float:
        """count_zero_weights (reference model.py:59-66) computed ON DEVICE:
        one jitted call + one scalar fetch, instead of pulling every
        parameter tensor to host each epoch (the CLIs print this per epoch;
        a full params_numpy() costs a round-trip per tensor over
        remote-dispatch transports)."""
        if self._pruned_frac_fn is None:
            from robocupvision_tpu.ops.pruning import near_zero_fraction_traceable

            order = self.model.param_order
            self._pruned_frac_fn = jax.jit(
                lambda params: near_zero_fraction_traceable(params, order))
        return float(self._pruned_frac_fn(self.state.params))
