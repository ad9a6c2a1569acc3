"""Training loop.

Behavioral reference: /root/reference/train.py:30-177 — index-refresh scheduling,
retrieval-in-the-loop batches, joint optimizer steps, periodic log/eval/save. The
loss-scale adaptation block (train.py:96-116) is fp16-only and intentionally absent
(bf16 training); its grad statistics and NaN step-skip live inside the jitted step
(train/step.py). Device work per step: query embed -> sharded search -> one fused
train_step; tokenization stays host-side between them.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import numpy as np

from atlas_tpu.config import AtlasConfig
from atlas_tpu.eval.loop import evaluate
from atlas_tpu.index.io import save_embeddings_and_index
from atlas_tpu.model_io import save_atlas_model
from atlas_tpu.parallel.mesh import get_mesh, local_dp_size
from atlas_tpu.parallel.sharding import atlas_param_specs, fsdp_param_specs, shard_params
from atlas_tpu.tasks import get_task
from atlas_tpu.train.optim import make_optimizers
from atlas_tpu.train.step import TrainState, create_train_state, make_train_step
from atlas_tpu.utils.logging_utils import init_tb_logger
from atlas_tpu.utils.schedules import IndexRefreshScheduler
from atlas_tpu.utils.stats import WeightedAvgStats

logger = logging.getLogger(__name__)


def _prefetch_pretokenized(batches, atlas, enabled: bool = True):
    """Yield (batch, pretokenized) with the NEXT batch's query/target tokenization
    running on a worker thread while the caller's device step executes (SURVEY §7:
    the reference stalls the step on synchronous tokenization, atlas.py:428-444).
    Retrieval and passage tokenization stay synchronous — they need the step's
    updated retriever params for parity."""
    if not enabled:
        for b in batches:
            yield b, None
        return
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=1, thread_name_prefix="pretok")
    pending = None  # (batch, future)
    try:
        for b in batches:
            fut = ex.submit(atlas.pretokenize, b["query"], b["target"],
                            b.get("target_tokens"))
            if pending is not None:
                pb, pf = pending
                yield pb, pf.result()
            pending = (b, fut)
        if pending is not None:
            pb, pf = pending
            yield pb, pf.result()
    finally:
        ex.shutdown(wait=False, cancel_futures=True)


def _peak_memory_gib() -> float:
    """Peak device HBM use (GiB); 0 where the backend exposes no memory stats."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return stats.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        return 0.0


def train(
    atlas,
    index,
    passages,
    step: int,
    cfg: AtlasConfig,
    checkpoint_path,
    opt_state_raw=None,
    max_steps: Optional[int] = None,
    step_hook=None,
):
    """step_hook, if given, is called as step_hook(step, atlas) at the very end
    of every completed step (after the periodic save) — used by the preemption
    drill as a deterministic rendezvous point and available for custom
    per-step instrumentation."""
    tb_logger = init_tb_logger(os.path.join(cfg.checkpoint_dir, cfg.name), is_main=cfg.is_main)
    run_stats = WeightedAvgStats()
    task = get_task(cfg, atlas.reader_tokenizer)
    index_refresh_scheduler = IndexRefreshScheduler(
        cfg.refresh_index, cfg.freeze_retriever_steps, cfg.train_retriever
    )

    # --- mesh wiring: every real run is data-parallel (reference train.py:198-216
    # wraps the model in DDP/ShardedDataParallel; here params and batches get
    # explicit GSPMD placements over the global ("dp", "mp") mesh) ---
    mesh = getattr(index, "mesh", None) or get_mesh(cfg.dp_size, cfg.mp_size)
    atlas.set_mesh(mesh)
    ldp = local_dp_size(mesh)
    local_bsz = cfg.per_gpu_batch_size * ldp  # per-device batch x local dp rows
    logger.info(
        "mesh %s: per-device batch %d, process-local batch %d, global batch %d",
        dict(mesh.shape), cfg.per_gpu_batch_size, local_bsz,
        cfg.per_gpu_batch_size * mesh.shape.get("dp", 1),
    )

    reader_opt, retr_opt = make_optimizers(cfg)
    params = {"reader": atlas.reader_params, "retriever": atlas.retriever_params}
    specs = atlas_param_specs(params)
    if cfg.shard_optim or cfg.shard_grads:
        # ZeRO/FSDP over dp: grads + Adam moments inherit the dp-sharded param specs
        specs = fsdp_param_specs(params, specs, mesh.shape.get("dp", 1))
    params = shard_params(mesh, params, specs)
    state = create_train_state(params, reader_opt, retr_opt, cfg.accumulation_steps)
    # params must actually be distributed over the mesh, not resident on device 0
    # — EVERY tower (a partially-placed tree would pass a single-leaf check)
    n_mesh_devices = mesh.devices.size
    for tower, tree in state.params.items():
        if tree is None:
            continue
        for leaf in jax.tree.leaves(tree):
            assert len(leaf.sharding.device_set) == n_mesh_devices, (
                f"{tower} param leaf not distributed: {leaf.sharding} vs "
                f"{n_mesh_devices} devices"
            )
            break
    if opt_state_raw is not None:
        from atlas_tpu.model_io import flat_to_tree  # restore optimizer state
        from atlas_tpu.parallel.sharding import place_like

        try:
            restored = (flat_to_tree(opt_state_raw, state.opt_state)
                        if isinstance(opt_state_raw, dict) else opt_state_raw)
            # place each restored leaf on the sharding the fresh opt state carries
            # (FSDP/ZeRO placements): orbax-sharded leaves are already there (a
            # no-op); host-numpy npz leaves get placed up front instead of the
            # donated jitted step silently paying the transfer at step 1
            restored = jax.tree.map(place_like, restored, state.opt_state)
            state = state._replace(opt_state=restored)
        except Exception as e:
            logger.warning("could not restore optimizer state: %s", e)
    state = state._replace(step=state.step + step)
    train_step = make_train_step(atlas, cfg, reader_opt, retr_opt)
    # ONE key shared by every process: the train step is a single SPMD program
    # over the global mesh, and a replicated jit argument must be equal on all
    # processes (per-rank keys here are formally undefined once a TP-sharded
    # activation spans hosts). Per-position dropout diversity comes from the
    # counter-based PRNG over the GLOBAL batch inside the jit, not from
    # per-rank seeds (the reference's per-rank torch seeding is a DDP-ism).
    rng = jax.random.PRNGKey(cfg.seed)

    profile_range = None
    if cfg.profile_steps:
        a, b = cfg.profile_steps.split("-")
        profile_range = (int(a), int(b))

    total = max_steps if max_steps is not None else cfg.total_steps
    batch_placement_checked = False
    refresh_slabs_per_step = 1  # set when an overlapped refresh starts
    while step < total:
        made_progress = False
        data_iterator = task.data_iterator(
            cfg.train_data, cfg.global_rank, cfg.world_size,
            repeat_if_less_than_world_size=True, opt=cfg,
        )
        data_iterator = filter(None, map(task.process, data_iterator))
        data_iterator = task.batch_iterator(
            data_iterator, local_bsz, drop_last=True, shuffle=cfg.shuffle
        )
        for batch, pretok in _prefetch_pretokenized(
            data_iterator, atlas, enabled=cfg.host_prefetch
        ):
            made_progress = True
            iter_stats = {}
            if not cfg.use_file_passages and index_refresh_scheduler.is_time_to_refresh(step):
                if not (step == 0 and cfg.load_index_path is not None):
                    # refresh uses the CURRENT retriever params
                    atlas.retriever_params = state.params.get("retriever")
                    if cfg.refresh_overlap > 0:
                        # overlapped refresh: snapshot params now, embed a few
                        # slabs per train step instead of stalling every rank for
                        # the whole corpus pass (reference train.py:65-73)
                        if atlas.index_refresh_in_progress:
                            logger.warning(
                                "step %d: refresh due but the previous overlapped "
                                "refresh is still in flight — continuing it "
                                "(raise refresh interval or lower refresh_overlap)",
                                step,
                            )
                        else:
                            atlas.start_index_refresh(
                                index, passages, cfg.per_gpu_embedder_batch_size
                            )
                            refresh_slabs_per_step = max(
                                1,
                                -(-atlas._corpus_embedder.n_steps // cfg.refresh_overlap),
                            )
                    else:
                        indexing_start = time.time()
                        atlas.build_index(index, passages, cfg.per_gpu_embedder_batch_size, logger)
                        iter_stats["runtime/indexing"] = (time.time() - indexing_start, 1)
                        if cfg.save_index_path is not None:
                            save_embeddings_and_index(index, cfg)
            step += 1
            if profile_range is not None and step == profile_range[0]:
                trace_dir = os.path.join(cfg.checkpoint_dir, cfg.name, "traces")
                jax.profiler.start_trace(trace_dir)
                logger.info("profiler trace started -> %s", trace_dir)
            train_step_start = time.time()

            atlas.retriever_params = state.params.get("retriever")
            atlas.reader_params = state.params["reader"]
            device_batch, retrieved_passages = atlas.make_batch(
                index,
                query=batch["query"],
                target=batch["target"],
                target_tokens=batch.get("target_tokens"),
                passages=batch["passages"] if cfg.use_file_passages else None,
                batch_metadata=batch.get("metadata"),
                filtering_fun=task.filter,
                training=True,
                iter_stats=iter_stats,
                pretokenized=pretok,
            )
            if not batch_placement_checked:
                shd = device_batch["reader_ids"].sharding
                assert len(shd.device_set) == n_mesh_devices, (
                    f"batch not distributed over the mesh: {shd}"
                )
                logger.info("device batch sharding: %s", shd)
                batch_placement_checked = True
            train_retriever = cfg.train_retriever and step > cfg.freeze_retriever_steps
            state, metrics = train_step(state, device_batch, rng, train_retriever)

            if atlas.index_refresh_in_progress:
                # ride a few refresh slabs on this step: the train step above is
                # already dispatched, and the NEXT slab's tokenization ran on the
                # embedder's worker thread during the previous step's device time
                indexing_start = time.time()
                done = atlas.advance_index_refresh(refresh_slabs_per_step)
                iter_stats["runtime/indexing"] = (time.time() - indexing_start, 1)
                if done:
                    logger.info("overlapped index refresh completed at step %d", step)
                    if cfg.save_index_path is not None:
                        save_embeddings_and_index(index, cfg)

            jax.block_until_ready(metrics["loss/train_loss"])
            if os.environ.get("ATLAS_DEBUG_PARITY"):
                # parity triage (multi- vs single-process): global mean loss plus
                # the process-local retrieved doc ids, printed per step
                ids = ([[p.get("id") for p in row] for row in retrieved_passages]
                       if not cfg.use_file_passages else "file")
                print(f"PARITYDBG step={step} rank={cfg.global_rank} "
                      f"loss={float(metrics['loss/train_loss']):.9f} ids={ids}",
                      flush=True)
            if profile_range is not None and step == profile_range[1]:
                jax.profiler.stop_trace()
                logger.info("profiler trace stopped")
                profile_range = None
            iter_stats["runtime/train_step"] = (time.time() - train_step_start, 1)
            for k, v in metrics.items():
                iter_stats[k] = (float(v), len(batch["query"]))
            run_stats.update(iter_stats)

            if step % cfg.log_freq == 0:
                log = f"{step} / {total}"
                for k, v in sorted(run_stats.average_stats.items()):
                    log += f" | {k}: {v:.3g}"
                    if tb_logger:
                        tb_logger.add_scalar(k, v, step)
                log += f" | Memory: {_peak_memory_gib():.1f} GiB"  # train.py:136-140 role
                logger.info(log)
                run_stats.reset()

            if step % cfg.eval_freq == 0:
                atlas.reader_params = state.params["reader"]
                atlas.retriever_params = state.params.get("retriever")
                for data_path in cfg.eval_data:
                    dataset_name = os.path.basename(data_path)
                    metrics_eval = evaluate(atlas, index, cfg, data_path, step)
                    log_message = f"Dataset: {dataset_name}"
                    for k, v in metrics_eval.items():
                        log_message += f" | {v:.3f} {k}"
                        if tb_logger:
                            tb_logger.add_scalar(f"{dataset_name}/{k}", v, step)
                    logger.info(log_message)

            if step % cfg.save_freq == 0:
                atlas.reader_params = state.params["reader"]
                atlas.retriever_params = state.params.get("retriever")
                save_atlas_model(atlas, state.opt_state, step, cfg, checkpoint_path, f"step-{step}")

            if step_hook is not None:
                step_hook(step, atlas)

            if step >= total:
                break
        if not made_progress:
            # drop_last=True with fewer examples than the local batch yields no
            # batches — without this the while-loop spins on empty epochs forever
            raise ValueError(
                f"train_data produced no batches at process-local batch size "
                f"{local_bsz} (per-device {cfg.per_gpu_batch_size} x {ldp} local "
                f"dp rows); reduce per_gpu_batch_size or provide more examples"
            )

    if atlas.index_refresh_in_progress:
        # don't leave a mixed-version index behind at exit: finish the in-flight
        # overlapped refresh so final save/eval see one retriever's corpus
        logger.info("finishing in-flight overlapped refresh at training end")
        atlas.advance_index_refresh(atlas._corpus_embedder.n_steps)
        if cfg.save_index_path is not None:
            save_embeddings_and_index(index, cfg)
    atlas.reader_params = state.params["reader"]
    atlas.retriever_params = state.params.get("retriever")
    return atlas, state, step
