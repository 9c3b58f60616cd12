"""The training orchestrator.

Replaces the reference's PyTorch-Lightning Trainer + DDP strategy
(SURVEY.md §1 L4, §2.8) with a jit-compiled functional loop:

- one ``train_step(state, batch, rng)`` compiled per shape bucket, run
  under ``shard_map`` over a 1-D ``dp`` device mesh — each device consumes
  its self-contained sub-batch (see gcpnet_tpu.data.batching) and gradients
  / losses ride a single ``pmean`` over ICI;
- adaptive gradient clipping from an on-device ring of recent grad norms
  (the reference's Queue-based 1.5*mean+2*std rule,
  gcpnet_eq_module.py:556-594);
- host-side epoch loop: metric collection, best-k orbax checkpointing,
  early stopping, plateau LR control, CSV/stdout logging.

Failure-handling parity (SURVEY.md §5.3): static shapes make CUDA-OOM
skips unnecessary; NaN/inf losses skip the optimizer update via a masked
``where`` (reference gcpnet_ar_module.py:217-219).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gcpnet_tpu.graph import GraphBatch
from gcpnet_tpu.parallel.mesh import make_mesh, shard_graph_batch
from gcpnet_tpu.train.checkpoints import CheckpointManager
from gcpnet_tpu.train.metrics import Collector
from gcpnet_tpu.train.optim import PlateauController, build_optimizer
from gcpnet_tpu.train.state import TrainState
from gcpnet_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)

Array = jax.Array


def _to_bf16(tree):
    """Cast float arrays to bfloat16 (ints/bools untouched)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


class _AutoLayoutStep:
    """AOT-compile a (state, *rest) step with AUTO state layouts.

    With a plain ``jax.jit(..., donate_argnums=(0,))`` the first dispatch
    compiles against the state's host-default layouts, but the compiler
    is free to pick DIFFERENT layouts for the donated state outputs — so
    dispatch 2, whose state inputs are dispatch 1's outputs, triggers a
    SECOND full compile (measured: two distinct ~40 MB persistent-cache
    entries and ~7 extra minutes per training session through the remote
    tunnel; see bench.py for the same fix on the benchmark path).

    This wrapper lowers on abstract avals with ``Layout.AUTO`` for the
    state argument/output (batch/rng/lr keep their concrete shardings and
    default layouts, so uploaded batches are consumed as-is), compiles
    ONCE, and device_puts the incoming state into the compiled input
    format on first use.  The first wrapped executable to compile OWNS
    the state layout: its chosen format is recorded in the shared
    ``owner`` dict, and later executables (e.g. the single-step tail path
    after the scan path) pin their state input AND output to the same
    format — state flowing between executables never changes layout, so
    each executable compiles exactly once per batch shape.
    """

    def __init__(self, fn, owner: dict):
        self._fn = fn
        self._owner = owner
        self._compiled: dict = {}
        self._plain = None  # fallback: plain jit if AOT layout compile fails

    def __call__(self, state, *rest):
        from jax.experimental.layout import Format, Layout

        if self._plain is not None:
            return self._plain(state, *rest)
        key = tuple(
            (a.shape, str(a.dtype))
            for a in jax.tree_util.tree_leaves((state,) + rest)
        )
        entry = self._compiled.get(key)
        if entry is None:
            state_fmt = self._owner.get("state_format")
            in_state = (
                state_fmt if state_fmt is not None else Format(Layout.AUTO)
            )
            rest_shardings = tuple(
                jax.tree_util.tree_map(lambda a: a.sharding, r)
                for r in rest
            )
            jf = jax.jit(
                self._fn,
                donate_argnums=(0,),
                # every wrapped step returns (state, loss, gnorm)
                in_shardings=(in_state,) + rest_shardings,
                out_shardings=(in_state, None, None),
            )
            abstract = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                (state,) + rest,
            )
            try:
                compiled = jf.lower(*abstract).compile()
            except Exception as exc:  # pragma: no cover - backend-specific
                log.warning(
                    "AUTO-layout AOT compile failed (%s); falling back to "
                    "plain jit (a one-time duplicate compile may occur)",
                    exc,
                )
                self._plain = jax.jit(self._fn, donate_argnums=(0,))
                return self._plain(state, *rest)
            if state_fmt is None:
                self._owner["state_format"] = compiled.input_formats[0][0]
            entry = self._compiled[key] = compiled
        fmt = self._owner.get("state_format")
        if fmt is not None:
            # no-op when the state already carries the fixpoint layout
            state = jax.tree_util.tree_map(jax.device_put, state, fmt)
        return entry(state, *rest)


class Trainer:
    def __init__(
        self,
        model,
        loss_fn: Callable,
        optimizer_cfg: Optional[Dict[str, Any]] = None,
        scheduler_cfg: Optional[Dict[str, Any]] = None,
        max_epochs: int = 1,
        mesh: Optional[Mesh] = None,
        adaptive_clip: bool = False,
        clip_std_multiplier: float = 2.0,
        checkpoint_dir: Optional[str] = None,
        monitor: str = "val/loss",
        monitor_mode: str = "min",
        early_stopping_patience: Optional[int] = 10,
        save_top_k: int = 30,
        seed: int = 42,
        collect_fn: Optional[Callable] = None,
        metric_fns: Optional[Dict[str, Callable]] = None,
        log_dir: Optional[str] = None,
        log_every_n_steps: int = 50,
        max_steps_per_epoch: Optional[int] = None,
        min_epochs: int = 0,
        check_val_every_n_epoch: int = 1,
        loggers: Optional[list] = None,
        profiler_trace_dir: Optional[str] = None,
        precision: int = 32,
        scan_chunk_size: int = 1,
        checkpoint_every_n_steps: Optional[int] = None,
    ):
        self.scan_chunk_size = max(1, int(scan_chunk_size))
        self._train_scan = None
        self.min_epochs = min_epochs
        self.check_val_every_n_epoch = max(1, check_val_every_n_epoch)
        self.loggers = loggers or []
        self.profiler_trace_dir = profiler_trace_dir
        # bf16 compute policy (native on TPU): params stay fp32 masters,
        # compute runs in bfloat16, loss/update in fp32 (the analog of the
        # reference's `precision: 16` trainer flag, SURVEY.md §2.8)
        self.precision = int(precision)
        self.model = model
        self.loss_fn = loss_fn
        self.optimizer_cfg = optimizer_cfg or {"_target_": "Adam", "lr": 1e-4}
        self.scheduler_cfg = scheduler_cfg
        self.max_epochs = max_epochs
        self.mesh = mesh if mesh is not None else make_mesh()
        self.num_shards = self.mesh.devices.size
        self.adaptive_clip = adaptive_clip
        self.clip_std_multiplier = clip_std_multiplier
        self.monitor = monitor
        self.monitor_mode = monitor_mode
        self.early_stopping_patience = early_stopping_patience
        self.seed = seed
        self.collect_fn = collect_fn
        self.metric_fns = metric_fns or {}
        self.log_every_n_steps = log_every_n_steps
        self.max_steps_per_epoch = max_steps_per_epoch

        # StepLR-style schedules fold into the optax chain; plateau runs on
        # the host via lr_scale
        from gcpnet_tpu.train.optim import build_schedule

        sched = None
        if scheduler_cfg:
            try:
                sched = build_schedule(
                    scheduler_cfg,
                    base_lr=float(self.optimizer_cfg.get("lr", 1e-4)),
                )
            except ValueError:
                sched = None
        if sched is not None:
            self.optimizer_cfg = {**self.optimizer_cfg, "_schedule_": sched}
        self.tx = build_optimizer(self.optimizer_cfg)
        self.plateau = None
        if scheduler_cfg and "plateau" in str(
            scheduler_cfg.get("_target_", "")
        ).lower():
            self.plateau = PlateauController(
                factor=float(scheduler_cfg.get("factor", 0.1)),
                patience=int(scheduler_cfg.get("patience", 10)),
                mode=scheduler_cfg.get("mode", "min"),
            )

        self.ckpt = None
        self.checkpoint_every_n_steps = checkpoint_every_n_steps
        self._last_step_ckpt = 0
        if checkpoint_dir:
            self.ckpt = CheckpointManager(
                checkpoint_dir,
                max_to_keep=save_top_k,
                monitor=monitor,
                mode=monitor_mode,
                every_n_steps=checkpoint_every_n_steps,
            )
        self.log_dir = log_dir
        self._train_step = None
        self._eval_step = None
        self._eval_scan = None
        # shared state-layout fixpoint across the scan/step executables
        self._layout_owner: Dict[str, Any] = {}
        self.state: Optional[TrainState] = None
        self.history: Dict[str, list] = {}

    # ------------------------------------------------------------------
    def init_state(self, example_batch: GraphBatch) -> TrainState:
        rng = jax.random.key(self.seed)
        # jit: a single compiled (and persistently cached) init instead of
        # minutes of eager per-param dispatch on slow hosts
        variables = jax.jit(self.model.init, static_argnums=(2,))(
            {"params": rng, "dropout": rng}, example_batch, True
        )
        params = variables["params"]
        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
        )
        log.info(f"model initialized: {n_params:,} params")
        self.state = TrainState.create(
            params, self.tx, adaptive_clip=self.adaptive_clip
        )
        return self.state

    # ------------------------------------------------------------------
    def _build_train_step(self):
        tx = self.tx
        model = self.model
        loss_fn = self.loss_fn
        adaptive = self.adaptive_clip
        k_std = self.clip_std_multiplier
        half = self.precision in (16, "16", "bf16")

        def local_step(state: TrainState, batch: GraphBatch, rng, lr_scale):
            shard = jax.lax.axis_index("dp")
            dropout_rng = jax.random.fold_in(jax.random.fold_in(rng, shard), state.step)

            def loss_wrapped(params):
                apply_params, apply_batch = params, batch
                if half:
                    apply_params = _to_bf16(params)
                    apply_batch = _to_bf16(batch)
                out = model.apply(
                    {"params": apply_params},
                    apply_batch,
                    False,
                    rngs={"dropout": dropout_rng},
                )
                out = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float32)
                    if a.dtype == jnp.bfloat16
                    else a,
                    out,
                )
                loss, _ = loss_fn(out, batch)
                return loss

            loss, grads = jax.value_and_grad(loss_wrapped)(state.params)
            loss = jax.lax.pmean(loss, "dp")
            grads = jax.lax.pmean(grads, "dp")

            gnorm = optax.global_norm(grads)
            ring = state.grad_norms
            if adaptive and ring is not None:
                thr = ring.clip_threshold(k_std)
                scale = jnp.minimum(1.0, thr / jnp.maximum(gnorm, 1e-12))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
                ring = ring.push(jnp.minimum(gnorm, thr))

            # NaN/inf-loss guard: skip the update entirely — params AND
            # opt_state keep their old values on a bad step, so Adam moments
            # do not move (reference skips backprop on invalid loss,
            # gcpnet_ar_module.py:217-219).
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, 0.0), grads
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            updates = jax.tree_util.tree_map(
                lambda u: u * lr_scale, updates
            )
            params = optax.apply_updates(state.params, updates)
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), params, state.params
            )
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old),
                opt_state, state.opt_state,
            )
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                grad_norms=ring,
            )
            return new_state, loss, gnorm

        mapped = shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(P(), P("dp"), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        self._local_step = local_step
        return _AutoLayoutStep(mapped, self._layout_owner)

    def _build_train_scan(self):
        """One jitted dispatch for a whole stack of same-shape batches:
        lax.scan over the leading stack axis inside shard_map.  Amortizes
        host->device dispatch latency (dominant for small graphs, and for
        remote-tunneled chips)."""
        if self._train_step is None:
            self._train_step = self._build_train_step()
        local_step = self._local_step

        def local_scan(state: TrainState, stacked: GraphBatch, rng, lr_scale):
            def body(carry, batch):
                st, = carry
                st, loss, gnorm = local_step(st, batch, rng, lr_scale)
                return (st,), (loss, gnorm)

            (state,), (losses, gnorms) = jax.lax.scan(body, (state,), stacked)
            return state, jnp.mean(losses), jnp.mean(gnorms)

        mapped = shard_map(
            local_scan,
            mesh=self.mesh,
            in_specs=(P(), P(None, "dp"), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return _AutoLayoutStep(mapped, self._layout_owner)

    def _build_eval_step(self):
        model = self.model
        loss_fn = self.loss_fn

        def local_eval(state: TrainState, batch: GraphBatch):
            out = model.apply({"params": state.params}, batch, True)
            loss, _ = loss_fn(out, batch)
            loss = jax.lax.pmean(loss, "dp")
            return loss, out

        mapped = shard_map(
            local_eval,
            mesh=self.mesh,
            in_specs=(P(), P("dp")),
            out_specs=(P(), P("dp")),
            check_vma=False,
        )
        return jax.jit(mapped)

    def _build_eval_scan(self):
        """One dispatch for a stack of same-shape eval batches — essential
        when per-dispatch latency is high (remote-tunneled chips can cost
        ~1s per execution; SURVEY.md §5.1 perf notes)."""
        model = self.model
        loss_fn = self.loss_fn

        def local_scan(state: TrainState, stacked: GraphBatch):
            def body(carry, batch):
                out = model.apply({"params": state.params}, batch, True)
                loss, _ = loss_fn(out, batch)
                loss = jax.lax.pmean(loss, "dp")
                return carry, (loss, out)

            _, (losses, outs) = jax.lax.scan(body, 0, stacked)
            return losses, outs

        mapped = shard_map(
            local_scan,
            mesh=self.mesh,
            in_specs=(P(), P(None, "dp")),
            out_specs=(P(), P(None, "dp")),
            check_vma=False,
        )
        return jax.jit(mapped)

    # ------------------------------------------------------------------
    def _put(self, batch: GraphBatch) -> GraphBatch:
        return shard_graph_batch(batch, self.mesh)

    @staticmethod
    def _prefetched(gen, depth: int = 2):
        """Run ``gen`` (host featurize/stack + device_put) in a background
        thread, ``depth`` items ahead: host->device uploads overlap device
        compute instead of serializing with it (the reference leans on
        DataLoader workers + prefetch_factor for the same reason,
        atom3d_datamodule.py:174-181)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        done = object()
        err: list = []

        def worker():
            try:
                for item in gen:
                    q.put(item)
            except BaseException as exc:  # surface in the consumer
                err.append(exc)
            finally:
                q.put(done)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if item is done:
                if err:
                    raise err[0]
                return
            yield item

    def train_epoch(self, batches: Iterable[GraphBatch], epoch: int) -> Dict:
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if self.scan_chunk_size > 1 and self._train_scan is None:
            self._train_scan = self._build_train_scan()
        rng = jax.random.key(self.seed + 17)
        lr_scale = jnp.asarray(
            self.plateau.scale if self.plateau else 1.0, jnp.float32
        )
        # losses stay on device until epoch end: forcing them per chunk
        # would serialize dispatch with execution (costly on remote chips).
        # Each entry carries its step count so a full scan chunk (a mean over
        # K steps) and a single tail step weigh correctly in the epoch mean.
        losses = []
        loss_weights = []
        t0 = time.time()
        n = 0

        def host_items():
            """Yield ("scan", device_chunk, k) / ("step", device_batch)
            with stacking + upload done here (the prefetch thread)."""
            chunk: list = []
            for i, batch in enumerate(batches):
                if (
                    self.max_steps_per_epoch is not None
                    and i >= self.max_steps_per_epoch
                ):
                    break
                if self.scan_chunk_size > 1:
                    chunk.append(batch)
                    if len(chunk) == self.scan_chunk_size:
                        stacked = jax.tree_util.tree_map(
                            lambda *xs: np.stack(
                                [np.asarray(x) for x in xs]
                            ),
                            *chunk,
                        )
                        yield ("scan", self._put_stacked(stacked), len(chunk))
                        chunk = []
                else:
                    yield ("step", self._put(batch), i)
            for b in chunk:  # tail: single steps
                yield ("step", self._put(b), -1)

        for item in self._prefetched(host_items(), depth=2):
            kind, payload = item[0], item[1]
            if kind == "scan":
                self.state, loss, gnorm = self._train_scan(
                    self.state, payload, rng, lr_scale
                )
                losses.append(loss)
                loss_weights.append(float(item[2]))
                n += item[2]
            else:
                self.state, loss, gnorm = self._train_step(
                    self.state, payload, rng, lr_scale
                )
                n += 1
                # every step's loss enters the epoch mean (they are device
                # scalars, fetched in ONE device_get at epoch end) — the
                # scan path already averages all K chunk losses on device
                losses.append(loss)
                loss_weights.append(1.0)
        # step-frequency checkpointing (the reference NStepModelCheckpoint,
        # src/utils/__init__.py:25)
        if self.ckpt is not None and self.checkpoint_every_n_steps:
            step = int(self.state.step)
            if step - self._last_step_ckpt >= self.checkpoint_every_n_steps:
                self.ckpt.save(step, self.state, {"step": float(step)})
                self._last_step_ckpt = step
        dt = time.time() - t0
        metrics = {
            "train/loss": (
                float(
                    np.average(
                        [float(l) for l in jax.device_get(losses)],
                        weights=loss_weights,
                    )
                )
                if losses
                else float("nan")
            ),
            "train/steps_per_sec": n / max(dt, 1e-9),
        }
        return metrics

    def _put_stacked(self, stacked: GraphBatch) -> GraphBatch:
        from jax.sharding import NamedSharding, PartitionSpec

        shard = NamedSharding(self.mesh, PartitionSpec(None, "dp"))
        repl = NamedSharding(self.mesh, PartitionSpec())

        def put(x):
            arr = jnp.asarray(x)
            if arr.ndim <= 1:
                return jax.device_put(arr, repl)
            return jax.device_put(arr, shard)

        return jax.tree_util.tree_map(put, stacked)

    def eval_epoch(
        self, batches: Iterable[GraphBatch], prefix: str = "val"
    ) -> Dict:
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        if self.state is None:
            # evaluating without a prior fit (train=false): init params
            batches = iter(batches)
            first = next(batches, None)
            if first is None:
                return {f"{prefix}/loss": float("nan")}
            self.init_state(self._put(first))
            import itertools

            batches = itertools.chain([first], batches)
        losses = []
        collector = Collector() if self.collect_fn else None

        def consume(loss, out, batch):
            losses.append(float(loss))
            if collector is not None:
                self.collect_fn(collector, jax.device_get(out), batch)

        if self.scan_chunk_size > 1:
            if self._eval_scan is None:
                self._eval_scan = self._build_eval_scan()
            chunk: list = []

            def flush():
                if not chunk:
                    return
                if len(chunk) == self.scan_chunk_size:
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *chunk,
                    )
                    stacked_dev = self._put_stacked(stacked)
                    ls, outs = self._eval_scan(self.state, stacked_dev)
                    ls = np.asarray(ls)
                    outs = jax.device_get(outs)
                    for i, b in enumerate(chunk):
                        out_i = jax.tree_util.tree_map(lambda a: a[i], outs)
                        consume(ls[i], out_i, b)
                else:
                    for b in chunk:
                        loss, out = self._eval_step(self.state, self._put(b))
                        consume(loss, out, b)
                chunk.clear()

            for batch in batches:
                chunk.append(batch)
                if len(chunk) == self.scan_chunk_size:
                    flush()
            flush()
        else:
            for batch in batches:
                dev_batch = self._put(batch)
                loss, out = self._eval_step(self.state, dev_batch)
                consume(loss, out, batch)
        metrics = {
            f"{prefix}/loss": float(np.mean(losses)) if losses else float("nan")
        }
        if collector is not None and self.metric_fns:
            p, l, g = collector.cat()
            for name, fn in self.metric_fns.items():
                try:
                    if name == "grouped":
                        for k, v in fn(p, l, g).items():
                            metrics[f"{prefix}/{k}"] = v
                    else:
                        metrics[f"{prefix}/{name}"] = fn(p, l)
                except Exception as exc:  # metric failure must not kill training
                    log.warning(f"metric {name} failed: {exc}")
        return metrics

    # ------------------------------------------------------------------
    def fit(self, datamodule, resume: bool = False) -> Dict:
        if self.state is None:
            example = next(iter(datamodule.train_batches(seed=0)))
            self.init_state(self._put(example))
        if resume and self.ckpt is not None:
            restored = self.ckpt.restore_last(self.state)
            if restored is not None:
                self.state = restored
                log.info(f"resumed from step {int(self.state.step)}")

        if self.profiler_trace_dir:
            jax.profiler.start_trace(self.profiler_trace_dir)

        best = None
        bad_epochs = 0
        final_metrics: Dict = {}
        try:
            for epoch in range(self.max_epochs):
                tm = self.train_epoch(
                    datamodule.train_batches(seed=epoch), epoch
                )
                metrics = {**tm, "epoch": epoch}
                if epoch % self.check_val_every_n_epoch == 0:
                    metrics.update(
                        self.eval_epoch(datamodule.val_batches(), prefix="val")
                    )
                self._log_metrics(metrics)
                final_metrics = metrics

                monitored = metrics.get(self.monitor)
                if monitored is not None and np.isfinite(monitored):
                    if self.ckpt is not None:
                        self.ckpt.save(
                            int(self.state.step), self.state, metrics
                        )
                    if self.plateau is not None:
                        self.plateau.update(monitored)
                    improved = best is None or (
                        monitored < best
                        if self.monitor_mode == "min"
                        else monitored > best
                    )
                    if improved:
                        best = monitored
                        bad_epochs = 0
                    else:
                        bad_epochs += 1
                        if (
                            self.early_stopping_patience is not None
                            and epoch >= self.min_epochs
                            and bad_epochs > self.early_stopping_patience
                        ):
                            log.info(f"early stopping at epoch {epoch}")
                            break
        finally:
            if self.profiler_trace_dir:
                jax.profiler.stop_trace()
        return final_metrics

    def test(self, datamodule) -> Dict:
        metrics = self.eval_epoch(datamodule.test_batches(), prefix="test")
        self._log_metrics(metrics)
        return metrics

    def _log_metrics(self, metrics: Dict):
        msg = " | ".join(
            f"{k}={v:.5f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in sorted(metrics.items())
        )
        log.info(msg)
        for k, v in metrics.items():
            self.history.setdefault(k, []).append(v)
        step = int(self.state.step) if self.state is not None else None
        for lg in self.loggers:
            try:
                lg.log_metrics(metrics, step=step)
            except Exception as exc:
                log.warning(f"logger failed: {exc}")
        if self.log_dir:
            os.makedirs(self.log_dir, exist_ok=True)
            path = os.path.join(self.log_dir, "metrics.csv")
            write_header = not os.path.exists(path)
            with open(path, "a", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=sorted(metrics.keys()))
                if write_header:
                    writer.writeheader()
                writer.writerow(metrics)
