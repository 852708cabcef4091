"""Device-op profiling: trace a flagship workload and print an exclusive-time
breakdown from the xplane proto.

Replaces eyeballing raw traces: runs the chosen workload under
`jax.profiler.trace`, then aggregates the TPU "XLA Ops" timeline into
exclusive per-opcode (and per-fusion-output-shape) times using a
nesting-aware sweep. This is the tool behind the README's train-step and
encoder breakdowns.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_trace.py \
      [fwd|train|detect|yolo] [--iters N] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import collections
import glob
import re
import sys


def run_workload(which: str, iters: int, trace_dir: str, impl: str = None):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship_setup

    if which not in ("fwd", "train", "detect", "yolo"):
        raise SystemExit(f"unknown workload {which!r}")

    B = int(os.environ.get("POET_PROFILE_B", "16"))
    cfg, model, images, pad_mask, targets = _flagship_setup(B=B, H=480, W=640)
    if which in ("detect", "yolo"):
        # detector-in-the-loop (bbox_mode='backbone') configs — the bench.py
        # maskrcnn_detect_pose / yolov4_full_pyramid workloads. The flagship
        # model above only supplied the input tensors; its params are never
        # initialized for these branches.
        from poet_tpu.config import PoETConfig
        from poet_tpu.models import build_model
        from poet_tpu.utils.params import cast_params_for_inference

        cfg = PoETConfig()
        cfg.model.dtype = "bfloat16"
        cfg.model.bbox_mode = "backbone"
        cfg.model.enc_deform_impl = impl or "fused"
        if which == "detect":
            cfg.backbone.name = "maskrcnn"
        else:
            # reference-config YOLOv4-CSP (full stride-8/16/32 pyramid, S=6380)
            cfg.backbone.name = "yolov4"
            cfg.backbone.cfg_path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "configs", "ycbv_yolov4-csp.cfg")
            cfg.backbone.max_detections = 20
            cfg.backbone.encoder_min_stride = 1
            cfg.model.n_classes = 21
        model = build_model(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, None)
        params = cast_params_for_inference(params)
    else:
        if impl:
            from poet_tpu.models import build_model
            cfg.model.enc_deform_impl = impl
            model = build_model(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask,
                                     targets)

    if which != "train":
        # fwd/detect/yolo differ only in whether targets feed the model
        fwd_targets = targets if which == "fwd" else None

        @jax.jit
        def f(params, images):
            def body(i, c):
                out = model.apply(params, images * (1 + c * 1e-9), pad_mask,
                                  fwd_targets, deterministic=True)
                return jnp.mean(out["translations"].astype(jnp.float32))
            return lax.fori_loop(0, iters, body, jnp.float32(0.0))

        args = (params, images)
    else:
        from poet_tpu.engine.train import make_loss_fn

        loss_fn = make_loss_fn(model, cfg)
        g = jax.value_and_grad(loss_fn, has_aux=True)
        # rbg dropout keys: the config bench.py reports (threefry spends
        # ~10 ms/step of VPU on mask generation; see bench_train_step_img_s)
        rng = jax.random.key(0, impl="rbg")

        @jax.jit
        def f(params, images):
            def body(i, c):
                (total, _), grads = g(params, images * (1 + c * 1e-9),
                                      pad_mask, targets, rng)
                return total.astype(jnp.float32) + jax.tree_util.tree_reduce(
                    lambda a, l: a + jnp.sum(l).astype(jnp.float32), grads,
                    jnp.float32(0.0)) * 1e-9
            return lax.fori_loop(0, iters, body, jnp.float32(0.0))

        args = (params, images)

    float(f(*args))                       # compile outside the trace
    import jax.profiler

    jax.profiler.start_trace(trace_dir)
    float(f(*args))
    jax.profiler.stop_trace()


def report(trace_dir: str, iters: int, top: int = 20):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fh:
        xs.ParseFromString(fh.read())

    def cat_of(name):
        m = re.match(r"%?([a-z-]+)[\.\d]*", name)
        return m.group(1) if m else name[:30]

    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            evs = sorted(
                ((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                  p.event_metadata[ev.metadata_id].name)
                 for ev in line.events),
                key=lambda e: (e[0], -(e[1] - e[0])),
            )
            # exclusive time per opcode (proper-nesting stack sweep)
            agg = collections.Counter()
            cnt = collections.Counter()
            stack = []
            for s, e, name in evs:
                while stack and stack[-1][1] <= s:
                    stack.pop()
                if stack:
                    agg[cat_of(stack[-1][2])] -= min(e, stack[-1][1]) - s
                stack.append((s, e, name))
                agg[cat_of(name)] += e - s
                cnt[cat_of(name)] += 1
            total = sum(agg.values())
            print(f"total device time: {total / 1e9:.1f} ms over {iters} "
                  f"iterations = {total / 1e9 / iters:.2f} ms/iter")
            print(f"{'ms':>10} {'count':>7}  opcode")
            for cat, dur in agg.most_common(top):
                print(f"{dur / 1e9:10.2f} {cnt[cat]:7d}  {cat}")

            # floor-analysis buckets: how much of the step is irreducible
            # work (Pallas kernels, matmul/conv fusions, elementwise HBM
            # traffic) vs pure layout overhead (copies/converts/pads/
            # reshapes) vs control (sorts, while loops). The overhead
            # bucket is the harvestable part; the rest bounds the floor.
            buckets = {
                "pallas/custom-call": ("self", "detector", "custom-call",
                                       "deform", "roi"),
                "layout overhead": ("copy", "convert", "pad", "reshape",
                                    "transpose", "bitcast", "copy-done",
                                    "slice-done", "broadcast", "slice",
                                    "concatenate"),
                "control/sort": ("sort", "while", "select-and-scatter",
                                 "dynamic-update-slice", "dynamic-slice",
                                 "gather", "scatter"),
            }
            bagg = collections.Counter()
            for cat, dur in agg.items():
                for bname, keys in buckets.items():
                    if cat in keys:
                        bagg[bname] += dur
                        break
                else:
                    bagg["compute (fusion/conv/elementwise)"] += dur
            print("\nfloor buckets (exclusive ms | % of step):")
            for bname, dur in bagg.most_common():
                print(f"{dur / 1e9:10.2f} {100 * dur / total:5.1f}%  {bname}")

            # unnamed fusions by output shape (where the real compute hides)
            shapes = collections.Counter()
            scnt = collections.Counter()
            for _, _, name in evs:
                m = re.match(r"%fusion(\.\d+)? = (\S{1,60})", name)
                if m:
                    shapes[m.group(2)] += 1
            agg2 = collections.Counter()
            for s, e, name in evs:
                m = re.match(r"%fusion(\.\d+)? = (\S{1,60})", name)
                if m:
                    agg2[m.group(2)] += e - s
                    scnt[m.group(2)] += 1
            if agg2:
                print("\nunnamed fusions by output shape:")
                for shape, dur in agg2.most_common(top):
                    print(f"{dur / 1e9:10.2f} {scnt[shape]:7d}  {shape}")

            # top individual ops by total time (full-name prefix) — shows
            # WHICH adds/copies/converts dominate, not just the opcode bins
            agg3 = collections.Counter()
            cnt3 = collections.Counter()
            for s, e, name in evs:
                key = name[:110]
                agg3[key] += e - s
                cnt3[key] += 1
            print("\ntop individual ops (inclusive, name prefix):")
            for key, dur in agg3.most_common(top * 2):
                print(f"{dur / 1e9:10.2f} {cnt3[key]:7d}  {key}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("workload", nargs="?", default="fwd",
                    choices=["fwd", "train", "detect", "yolo"])
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", default="/tmp/poet_tpu_trace")
    ap.add_argument("--impl", default=None,
                    help="override cfg.enc_deform_impl for the workload")
    ap.add_argument("--report-only", action="store_true",
                    help="parse an existing trace dir without running")
    a = ap.parse_args()
    if not a.report_only:
        run_workload(a.workload, a.iters, a.out, a.impl)
    report(a.out, a.iters)
