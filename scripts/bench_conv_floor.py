"""kpad-grade floor analysis for the detect+pose conv block (VERDICT r4 #4).

The r4 breakdown asserted "near-roofline convs (~29 ms: ResNet body + RPN
head + fc6/fc7)" without a number. This script prices each conv group the
way bench_kpad.py priced the encoder dots:

  * analytic MAC + HBM-byte counts per conv group at the bench geometry
    (bs=16, 480x640, bf16 compute),
  * roofline ms = max(MACs / achieved-MXU, bytes / achieved-HBM) where the
    achieved peaks are MEASURED on this chip by a dense bf16 matmul chain
    and a big HBM copy (not datasheet numbers),
  * measured ms per group: each group runs STANDALONE under the same
    marginal chained-iteration timing bench.py uses.

measured / roofline per group is the headroom multiple: ~1x means the group
is at its floor and further effort must change the algorithm (or the
geometry), not the schedule.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_conv_floor.py
"""

from __future__ import annotations

import time

import numpy as np

B, H, W = 16, 480, 640
DT_BYTES = 2  # bf16


# ---------------------------------------------------------------------------
# analytic conv inventory
# ---------------------------------------------------------------------------

def conv_cost(ho, wo, cin, cout, k, b=B):
    """(MACs, bytes) for one conv at batch b (activations + weights, bf16)."""
    macs = b * ho * wo * cout * k * k * cin
    hi, wi = ho * 1, wo * 1  # ~same for stride-1 pads; close enough at 3x3
    bytes_ = (b * hi * wi * cin + b * ho * wo * cout + k * k * cin * cout) * DT_BYTES
    return macs, bytes_


def resnet50_body():
    """Conv inventory of the torchvision ResNet-50 body at 480x640."""
    groups = {}

    def add(group, ho, wo, cin, cout, k, n=1):
        m, by = conv_cost(ho, wo, cin, cout, k)
        macs, bys = groups.get(group, (0, 0))
        groups[group] = (macs + m * n, bys + by * n)

    # stem: 7x7/2 3->64 at 240x320
    add("stem", 240, 320, 3, 64, 7)
    # C2: 3 bottlenecks at 120x160, w=64
    add("C2", 120, 160, 64, 64, 1)          # first 1x1 in (from 64)
    add("C2", 120, 160, 64, 64, 3, n=3)     # 3x3s
    add("C2", 120, 160, 64, 256, 1, n=3)    # out 1x1s
    add("C2", 120, 160, 256, 64, 1, n=2)    # in 1x1s (blocks 2,3)
    add("C2", 120, 160, 64, 256, 1)         # downsample proj
    # C3: 4 bottlenecks at 60x80, w=128
    add("C3", 60, 80, 256, 128, 1)
    add("C3", 60, 80, 128, 128, 3, n=4)
    add("C3", 60, 80, 128, 512, 1, n=4)
    add("C3", 60, 80, 512, 128, 1, n=3)
    add("C3", 60, 80, 256, 512, 1)          # downsample (input 120x160 stride2 ~ priced at out)
    # C4: 6 bottlenecks at 30x40, w=256
    add("C4", 30, 40, 512, 256, 1)
    add("C4", 30, 40, 256, 256, 3, n=6)
    add("C4", 30, 40, 256, 1024, 1, n=6)
    add("C4", 30, 40, 1024, 256, 1, n=5)
    add("C4", 30, 40, 512, 1024, 1)
    # C5: 3 bottlenecks at 15x20, w=512
    add("C5", 15, 20, 1024, 512, 1)
    add("C5", 15, 20, 512, 512, 3, n=3)
    add("C5", 15, 20, 512, 2048, 1, n=3)
    add("C5", 15, 20, 2048, 512, 1, n=2)
    add("C5", 15, 20, 1024, 2048, 1)
    return groups


def fpn_rpn_costs():
    groups = {}
    lvls = [(120, 160, 256), (60, 80, 512), (30, 40, 1024), (15, 20, 2048)]

    def add(group, m, by):
        macs, bys = groups.get(group, (0, 0))
        groups[group] = (macs + m, bys + by)

    for ho, wo, cin in lvls:
        add("FPN", *conv_cost(ho, wo, cin, 256, 1))     # inner 1x1
        add("FPN", *conv_cost(ho, wo, 256, 256, 3))     # layer 3x3
    # RPN head: shared 3x3 + 1x1 obj (A=3) + 1x1 deltas (4A) on 5 levels
    for ho, wo in [(120, 160), (60, 80), (30, 40), (15, 20), (8, 10)]:
        add("RPN", *conv_cost(ho, wo, 256, 256, 3))
        add("RPN", *conv_cost(ho, wo, 256, 3, 1))
        add("RPN", *conv_cost(ho, wo, 256, 12, 1))
    return groups


def box_head_costs(n_roi=16000, mo=8, cp=256):
    """fc6 on the padded pooled block + fc7 + predictors (22 classes)."""
    k_in = mo * mo * cp
    macs = n_roi * k_in * 1024 + n_roi * 1024 * 1024 + n_roi * 1024 * (22 + 88)
    bytes_ = (n_roi * k_in + k_in * 1024 + n_roi * 1024 * 3
              + 1024 * 1024 + 1024 * 110) * DT_BYTES
    return {"fc6/fc7/pred": (macs, bytes_)}


# ---------------------------------------------------------------------------
# measured peaks + group timings
# ---------------------------------------------------------------------------

def _marginal(make_loop, n=8):
    loop_n, loop_2n = make_loop(n), make_loop(2 * n)
    loop_n(0.0)
    loop_2n(0.0)
    best_n = best_2n = float("inf")
    for k in range(6):
        t0 = time.perf_counter(); loop_n((2 * k + 1) * 1e-6); t_n = time.perf_counter() - t0
        t0 = time.perf_counter(); loop_2n((2 * k + 2) * 1e-6); t_2n = time.perf_counter() - t0
        best_n, best_2n = min(best_n, t_n), min(best_2n, t_2n)
    return max(best_2n - best_n, 1e-9) / n


def measured_peaks():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)

    def mk_mm(n):
        @jax.jit
        def loop(a, b, salt):
            def body(i, c):
                return jnp.dot(a + c * jnp.bfloat16(1e-30), b,
                               preferred_element_type=jnp.bfloat16)
            return lax.fori_loop(0, n, body, a + jnp.bfloat16(salt))[0, 0]
        return lambda s: float(loop(a, b, s))

    dt = _marginal(mk_mm, n=32)
    mxu = 4096 ** 3 / dt                       # MAC/s

    big = jnp.asarray(rng.normal(size=(256 * 1024 * 1024 // 4,)), jnp.float32)

    def mk_cp(n):
        @jax.jit
        def loop(x, salt):
            def body(i, c):
                return c * jnp.float32(1.0000001)
            return lax.fori_loop(0, n, body, x + salt)[0]
        return lambda s: float(loop(big, jnp.float32(s)))

    dt = _marginal(mk_cp, n=16)
    hbm = big.nbytes * 2 / dt                  # read+write bytes/s
    return mxu, hbm


def time_group(fn, *args, n=8):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def mk(n_iters):
        @jax.jit
        def loop(salt, *a):
            def body(i, c):
                out = fn(*a, c)
                return jnp.mean(out.astype(jnp.float32)) * 1e-12
            return lax.fori_loop(0, n_iters, body, jnp.float32(salt))
        return lambda s: float(loop(jnp.float32(s), *args))

    return _marginal(mk, n=n)


def main():
    import jax
    import jax.numpy as jnp

    from poet_tpu.models.resnet_fpn import FPN, ResNet50
    from poet_tpu.models.maskrcnn import RPNHead, TwoMLPHead

    print("measuring achieved peaks (dense bf16 matmul / big HBM pass)...")
    mxu, hbm = measured_peaks()
    print(f"achieved MXU {mxu/1e12:.1f} TMAC/s, HBM {hbm/1e9:.0f} GB/s\n")

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)

    groups = {}
    groups.update(resnet50_body())
    groups.update(fpn_rpn_costs())
    groups.update(box_head_costs())

    # ---- measured: body (stem + C2..C5) ----
    body = ResNet50(dtype=jnp.bfloat16)
    pb = jax.jit(body.init)(jax.random.PRNGKey(0), images)

    dt_body = time_group(
        lambda p, im, c: body.apply(p, im * (1 + c * 1e-9))[-1], pb, images)

    # ---- measured: FPN on C2..C5 ----
    feats = [jnp.asarray(rng.normal(size=(B, h, w, ch)), jnp.bfloat16)
             for h, w, ch in [(120, 160, 256), (60, 80, 512),
                              (30, 40, 1024), (15, 20, 2048)]]
    fpn = FPN(256, dtype=jnp.bfloat16, levels=("0", "1", "2", "3", "pool"))
    pf = jax.jit(fpn.init)(jax.random.PRNGKey(0), feats)

    def fpn_fn(p, f0, c):
        fs = [f0 * (1 + c * 1e-9)] + feats[1:]
        outs = fpn.apply(p, fs)
        # consume every level (returning one would DCE the finer-level convs)
        return sum(jnp.sum(v[:1, :1, :1].astype(jnp.float32))
                   for v in outs.values())
    dt_fpn = time_group(fpn_fn, pf, feats[0])

    # ---- measured: RPN head on the 5 FPN levels ----
    rfeats = [jnp.asarray(rng.normal(size=(B, h, w, 256)), jnp.bfloat16)
              for h, w in [(120, 160), (60, 80), (30, 40), (15, 20), (8, 10)]]
    rpn = RPNHead(3, dtype=jnp.bfloat16) if "dtype" in RPNHead.__dataclass_fields__ else RPNHead(3)
    pr = jax.jit(rpn.init)(jax.random.PRNGKey(0), rfeats)

    def rpn_fn(p, f0, c):
        fs = [rfeats[0] * (1 + c * 1e-9)] + rfeats[1:]
        logits, deltas = rpn.apply(p, fs)
        return logits[0]
    dt_rpn = time_group(rpn_fn, pr, rfeats[0])

    # ---- measured: box head (fc6 padded + fc7) at 16000 RoIs ----
    pooled = jnp.asarray(rng.normal(size=(16000, 8 * 8 * 256)), jnp.bfloat16)
    head = TwoMLPHead(padded_in=(8, 8, 256, 256), output_size=7,
                      dtype=jnp.bfloat16)
    ph = jax.jit(head.init)(jax.random.PRNGKey(0), pooled)

    def head_fn(p, x, c):
        return head.apply(p, x * (1 + c * 1e-9))
    dt_head = time_group(head_fn, ph, pooled)

    measured = {
        "body (stem+C2..C5)": dt_body,
        "FPN": dt_fpn,
        "RPN": dt_rpn,
        "fc6/fc7/pred": dt_head,
    }
    roof_map = {
        "body (stem+C2..C5)": ["stem", "C2", "C3", "C4", "C5"],
        "FPN": ["FPN"],
        "RPN": ["RPN"],
        "fc6/fc7/pred": ["fc6/fc7/pred"],
    }

    print(f"{'group':22s} {'roofline ms':>11s} {'measured ms':>11s} {'x floor':>8s}  bound")
    total_roof = total_meas = 0.0
    for g, keys in roof_map.items():
        macs = sum(groups[k][0] for k in keys)
        bys = sum(groups[k][1] for k in keys)
        t_mac = macs / mxu
        t_mem = bys / hbm
        roof = max(t_mac, t_mem)
        bound = "MXU" if t_mac > t_mem else "HBM"
        meas = measured[g]
        total_roof += roof
        total_meas += meas
        print(f"{g:22s} {roof*1e3:11.2f} {meas*1e3:11.2f} "
              f"{meas/roof:8.2f}  {bound} (mac {t_mac*1e3:.2f} / mem {t_mem*1e3:.2f})")
    print(f"{'TOTAL':22s} {total_roof*1e3:11.2f} {total_meas*1e3:11.2f} "
          f"{total_meas/total_roof:8.2f}")
    # per-stage detail for the body
    print("\nper-stage roofline detail (body):")
    for g in ["stem", "C2", "C3", "C4", "C5"]:
        macs, bys = groups[g]
        t_mac, t_mem = macs / mxu, bys / hbm
        print(f"  {g:5s} mac {t_mac*1e3:6.2f} ms  mem {t_mem*1e3:6.2f} ms  "
              f"-> floor {max(t_mac, t_mem)*1e3:6.2f} ms "
              f"({'MXU' if t_mac > t_mem else 'HBM'}-bound)")


if __name__ == "__main__":
    main()
