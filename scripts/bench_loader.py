"""Host input-pipeline throughput: can the loader feed the 414 img/s chip?

Generates a synthetic PoET-format dataset at full 480x640 resolution and
times `PoseDataLoader` epochs (decode + transforms + batch assembly in the
worker pool, host arrays only — no device transfer), for several worker
counts. The device side of the pipeline (double-buffered async device_put)
is already covered by the loader's prefetcher.

Usage: python scripts/bench_loader.py [n_images] [workers ...]
Env: DECODED_CACHE_MB=N sizes the decoded-image cache (--decoded_cache_mb);
the timed epoch then runs with every decode cached (cache-hit path).
"""

from __future__ import annotations

import sys
import tempfile
import time


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    workers_list = [int(w) for w in sys.argv[2:]] or [1, 4, 8, 16]

    sys.path.insert(0, "/root/repo")
    from tests.helpers import make_synthetic_dataset

    from poet_tpu.config import PoETConfig
    from poet_tpu.data.dataset import build_dataset
    from poet_tpu.data.loader import PoseDataLoader

    root = tempfile.mkdtemp()
    make_synthetic_dataset(root, n_train=n_images, n_test=4, H=480, W=640)

    import os
    cache_mb = int(os.environ.get("DECODED_CACHE_MB", "0"))
    cfg = PoETConfig()
    cfg.data.dataset_path = root
    cfg.data.decoded_cache_mb = cache_mb
    cfg.model.n_classes = 3
    ds = build_dataset("train", cfg)
    if cache_mb:
        print(f"decoded cache: {cache_mb} MB")

    for nw in workers_list:
        loader = PoseDataLoader(
            ds, batch_size=16, num_queries=10, shuffle=True, drop_last=True,
            num_workers=nw, device_put_fn=None,
        )
        # warm epoch (page cache, worker spin-up)
        for _ in loader.epoch(0):
            pass
        t0 = time.perf_counter()
        n = 0
        for images, pad_mask, targets in loader.epoch(1):
            n += images.shape[0]
        dt = time.perf_counter() - t0
        print(f"workers={nw:3d}: {n / dt:7.1f} img/s host-side "
              f"({dt / max(n, 1) * 1e3:.2f} ms/img)")


if __name__ == "__main__":
    main()
