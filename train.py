"""Training CLI — the reference's entry surface (train.py:13-36) rebuilt.

    python train.py --config configs/replica/room0_vmap.json \
                    --logdir logs/room0 [--save_ckpt] [--resume <state.pkl>]

Per frame: ingest -> one jitted multi-object optimisation dispatch. Every
``n_vis_iter`` frames (and on the last frame): per-object mesh export to
``<logdir>/scene_mesh`` and optional checkpoints to ``<logdir>/ckpt``
(reference cadence, train.py:343-389). ``--save_ckpt`` is a real store_true
flag (the reference's ``type=bool`` accepts any string as True —
train.py:26-28 footgun fixed). ``--resume`` restores a full-state
checkpoint, a capability the reference lacks.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="vmap_tpu multi-object mapping")
    p.add_argument("--config", default="configs/synthetic_vmap.json")
    p.add_argument("--logdir", default="./logs/debug")
    p.add_argument("--save_ckpt", action="store_true")
    p.add_argument("--resume", default=None, help="full-state checkpoint file")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--profile", action="store_true",
                   help="print per-stage timings each frame")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace to DIR "
                        "(view with xprof/tensorboard)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    # Some environments register extra experimental platforms via
    # sitecustomize and override the JAX_PLATFORMS env var programmatically;
    # restore the standard env semantics so `JAX_PLATFORMS=cpu python
    # train.py` really runs on CPU.
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # multi-host: VMAP_COORDINATOR/VMAP_NUM_PROCESSES/VMAP_PROCESS_ID start
    # one process per host, all running this same loop over the same frame
    # stream; the object bank shards over the global mesh (tpu.mesh_axes)
    # and only the primary process writes artifacts. No-op single-process.
    from vmap_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()

    from vmap_tpu.parallel.distributed import init_from_env, is_primary
    init_from_env()

    primary = is_primary()
    if primary:
        os.makedirs(args.logdir, exist_ok=True)
        shutil.copy(args.config, args.logdir)

    from vmap_tpu.config import Config
    from vmap_tpu.core import checkpoint as ckpt_lib
    from vmap_tpu.core.mapper import FrameSample, Mapper
    from vmap_tpu.data.loader import PrefetchIterator, make_dataset
    from vmap_tpu.utils.profiling import StageTimer

    cfg = Config.from_json(args.config)
    dataset = make_dataset(cfg)
    n_frames = len(dataset)
    if args.max_frames is not None:
        n_frames = min(n_frames, args.max_frames)

    mapper = Mapper(cfg)
    start_frame = 0
    if args.resume:
        start_frame = ckpt_lib.load_full_checkpoint(mapper, args.resume) + 1
        if primary:
            print(f"resumed at frame {start_frame}")

    timer = StageTimer(enabled=args.profile)
    log_path = os.path.join(args.logdir, "train_log.jsonl")
    log_f = open(log_path if primary else os.devnull, "a")

    trace_cm = None
    if args.trace:
        from vmap_tpu.utils.profiling import device_trace
        import jax
        trace_dir = args.trace
        if jax.process_count() > 1:   # one trace dir per process
            trace_dir = f"{args.trace}_p{jax.process_index()}"
        args.trace = trace_dir
        trace_cm = device_trace(trace_dir)
        trace_cm.__enter__()

    it = iter(PrefetchIterator(dataset))
    t_start = time.time()
    pending: list = []
    log_every = 25
    for frame_idx in range(n_frames):
        with timer("data"):
            try:
                sample = next(it)
            except StopIteration:
                break
        if sample is None:
            continue
        if frame_idx < start_frame:
            continue

        with timer("ingest"):
            fs = FrameSample(image=sample["image"], depth=sample["depth"],
                             inst=sample["obj"], bbox_dict=sample["bbox_dict"],
                             t_wc=sample["T"], frame_id=sample["frame_id"])
            mapper.ingest_frame(fs)
        with timer("train"):
            metrics = mapper.train_frame()

        # defer the device->host loss sync: float()-ing every frame would
        # serialise dispatch with the TPU; keep the async handle and only
        # materialise at the logging cadence
        pending.append((frame_idx, metrics))
        if frame_idx % log_every == log_every - 1 or frame_idx == n_frames - 1:
            for fidx, met in pending:
                loss = float(met.get("loss", float("nan")))
                if loss > 1e5 and primary:
                    # the reference hard-exits here (render_rays.py:88-90);
                    # we log loudly and continue
                    print(f"WARNING: loss explosion at frame {fidx}: {loss:.3e}")
                log_f.write(json.dumps({
                    "frame": fidx, "loss": loss,
                    "n_objects": mapper.n_objects,
                    "pool_used": mapper.pool.n_used,
                    "step_time_s": met.get("step_time_s"),
                }) + "\n")
            pending.clear()
            fps = (frame_idx + 1 - start_frame) / max(time.time() - t_start, 1e-9)
            if primary:
                print(f"frame {frame_idx}/{n_frames} loss={loss:.3f} "
                      f"objs={mapper.n_objects} pool={mapper.pool.n_used} "
                      f"fps={fps:.2f}")
            log_f.flush()
        timer.report()

        is_vis = ((frame_idx % cfg.n_vis_iter == 0 or frame_idx == n_frames - 1)
                  and frame_idx >= 10)
        if is_vis:
            with timer("mesh"):
                mesh_dir = os.path.join(args.logdir, "scene_mesh")
                paths = mapper.export_meshes(mesh_dir, frame_idx)
                if primary:
                    print(f"frame {frame_idx}: exported {len(paths)} meshes "
                          f"-> {mesh_dir}")
            if args.save_ckpt:
                with timer("ckpt"):
                    ckpt_dir = os.path.join(args.logdir, "ckpt")
                    for obj_id in sorted(mapper.registry):
                        ckpt_lib.save_object_checkpoint(
                            mapper, obj_id,
                            os.path.join(ckpt_dir, str(obj_id)), frame_idx)
                    ckpt_lib.save_full_checkpoint(
                        mapper, os.path.join(ckpt_dir, "state"), frame_idx)

    if trace_cm is not None:
        trace_cm.__exit__(None, None, None)
        if primary:
            print(f"device trace written to {args.trace}")
    log_f.close()
    if primary:
        print(f"done: {mapper.n_objects} objects, "
              f"{mapper.frames_ingested} frames, "
              f"{time.time() - t_start:.1f}s")
    return mapper


if __name__ == "__main__":
    main()
