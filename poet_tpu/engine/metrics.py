"""Console metric logging: smoothed meters + periodic status lines.

Parity target: util/misc.py:66-285 (SmoothedValue / MetricLogger) with the
NCCL-backed cross-process sync replaced by
`jax.experimental.multihost_utils.process_allgather` when multiple hosts are
present (single-host: no-op).
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Dict, Iterable

import numpy as np


def _device_peak_mem_mb():
    """Peak device memory in MB, if the backend reports it.

    Parity: the reference prints torch.cuda.max_memory_allocated in every
    MetricLogger line (util/misc.py:250,274). TPU/CPU backends expose
    `memory_stats()['peak_bytes_in_use']`; returns None where unsupported
    (the line then omits the field rather than lying).
    """
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use") if stats else None
        return peak / (1024 * 1024) if peak else None
    except Exception:
        return None


class SmoothedValue:
    """Windowed median/avg meter. Parity: util/misc.py:66-125."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    def synchronize_between_processes(self):
        """Sum count/total across hosts (multi-host only)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = np.asarray([self.count, self.total], dtype=np.float64)
        gathered = multihost_utils.process_allgather(arr)
        self.count = int(gathered[:, 0].sum())
        self.total = float(gathered[:, 1].sum())

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    """Parity: util/misc.py:198-285 (ETA, iter/data time, smoothed meters)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def add_meter(self, name, meter):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def __str__(self):
        return self.delimiter.join(f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        i = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total is not None and i == total - 1):
                mem = _device_peak_mem_mb()
                mem_s = f" max mem: {mem:.0f}MB" if mem is not None else ""
                if total:
                    eta = str(datetime.timedelta(seconds=int(iter_time.global_avg * (total - i))))
                    print(f"{header} [{i}/{total}] eta: {eta} {self} "
                          f"time: {iter_time} data: {data_time}{mem_s}")
                else:
                    print(f"{header} [{i}] {self} time: {iter_time} "
                          f"data: {data_time}{mem_s}")
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        print(f"{header} Total time: {datetime.timedelta(seconds=int(total_time))} "
              f"({total_time / max(i, 1):.4f} s / it)")
