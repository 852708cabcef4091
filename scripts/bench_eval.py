"""LM-O-style full-eval benchmark (the last BASELINE.md config).

Two components, reported separately because they bound different resources:

  1. DEVICE eval step rate: jitted forward + final-layer Hungarian matching
     at bs=16 (the per-batch device work of `pose_evaluate`,
     engine/evaluate.py:169-186) — marginal chained-iteration timing.
  2. HOST metric passes: the evaluator's ADD / ADD-S / ADD(-S) / avg-t /
     avg-R sweeps over N accumulated poses with ~2.6k-point models and
     diameter-relative LM-O thresholds (what runs once per eval epoch).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_eval.py
"""

from __future__ import annotations

import sys
import tempfile
import time

import numpy as np


def marginal(run_n, n=4):
    f1, f2 = run_n(n), run_n(2 * n)
    f1(0.0)
    f2(0.0)

    def timed(f, s):
        t0 = time.perf_counter()
        f(s)
        return time.perf_counter() - t0

    t1 = min(timed(f1, 1e-6), timed(f1, 2e-6))
    t2 = min(timed(f2, 3e-6), timed(f2, 4e-6))
    return max(t2 - t1, 1e-9) / n


def bench_device_eval_step():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship_setup
    from poet_tpu.engine.train import make_eval_forward

    B = 16
    cfg, model, images, pad_mask, targets = _flagship_setup(B=B, H=480, W=640)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)
    fwd = make_eval_forward(model, cfg)

    def run_n(n):
        @jax.jit
        def loop(params, images, salt):
            def body(i, c):
                out = fwd(params, images * (1 + c * 1e-9 + salt),
                          pad_mask, targets)
                return (jnp.mean(out["pred_translation"].astype(jnp.float32))
                        + jnp.sum(out["match_tgt_idx"]).astype(jnp.float32) * 1e-9)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda s: float(loop(params, images, jnp.float32(s)))

    dt = marginal(run_n)
    print(f"device eval step (fwd + final matching, bs={B}): "
          f"{dt * 1e3:.2f} ms/batch ({B / dt:.1f} img/s)")
    return dt


def bench_evaluator_metrics(n_poses: int = 1000):
    sys.path.insert(0, "/root/repo")
    from tests.helpers import make_synthetic_dataset

    from poet_tpu.config import PoETConfig
    from poet_tpu.evaluation.pose_evaluator import build_pose_evaluator

    root = tempfile.mkdtemp()
    make_synthetic_dataset(root, n_train=2, n_test=2)

    cfg = PoETConfig()
    cfg.data.dataset_path = root
    cfg.data.dataset = "lmo"        # diameter-relative thresholds
    cfg.eval.models_path = "/models_eval/"
    cfg.eval.class_info = "/annotations/classes.json"
    cfg.eval.model_symmetry = "/annotations/symmetries.json"
    evaluator = build_pose_evaluator(cfg)

    rng = np.random.default_rng(0)
    classes = list(evaluator.classes)
    per_class = n_poses // len(classes)
    for ci in range(1, len(classes) + 1):
        for _ in range(per_class):
            q, r = np.linalg.qr(rng.normal(size=(3, 3)))
            q *= np.sign(np.diag(r))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            t_gt = rng.uniform(-0.2, 0.2, 3) + np.array([0, 0, 0.8])
            t_pred = t_gt + rng.normal(scale=0.01, size=3)
            dq = np.eye(3)  # small rotation error
            evaluator.record(ci, q @ dq, t_pred, q, t_gt, "000001/rgb/0.png",
                             np.eye(3, dtype=np.float32))

    out = tempfile.mkdtemp() + "/"
    t0 = time.perf_counter()
    evaluator.evaluate_pose_adds(out)
    evaluator.evaluate_pose_adi(out)
    evaluator.evaluate_pose_add(out)
    evaluator.calculate_class_avg_translation_error(out)
    evaluator.calculate_class_avg_rotation_error(out)
    dt = time.perf_counter() - t0
    n = sum(evaluator.num.values())
    print(f"evaluator metric passes (ADD+ADD-S+ADD(-S)+avg-t+avg-R, "
          f"{n} poses, {len(classes)} classes, diameter-relative): "
          f"{dt:.2f} s ({n / dt:.0f} poses/s)")
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("device", "all"):
        bench_device_eval_step()
    if which in ("metrics", "all"):
        bench_evaluator_metrics()
