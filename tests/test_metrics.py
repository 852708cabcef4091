"""MetricLogger / SmoothedValue console metrics (util/misc.py:66-285 parity)."""

import numpy as np

from poet_tpu.engine.metrics import MetricLogger, SmoothedValue, _device_peak_mem_mb


def test_smoothed_value_window_and_global():
    v = SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.avg == np.mean([2.0, 3.0, 4.0])          # windowed
    assert v.global_avg == np.mean([1.0, 2.0, 3.0, 4.0])
    assert v.value == 4.0


def test_metric_logger_log_every(capsys):
    lg = MetricLogger()
    lg.add_meter("loss", SmoothedValue(fmt="{value:.2f}"))
    seen = []
    for i in lg.log_every(range(5), print_freq=2, header="Ep[0]:"):
        lg.update(loss=float(i))
        seen.append(i)
    assert seen == list(range(5))
    out = capsys.readouterr().out
    assert "Ep[0]:" in out and "eta:" in out and "Total time:" in out
    # memory field present iff the backend reports peak bytes (real TPU VMs
    # do; the relay/CPU backends here return None and the field is omitted)
    assert ("max mem:" in out) == (_device_peak_mem_mb() is not None)


def test_device_peak_mem_never_raises():
    v = _device_peak_mem_mb()
    assert v is None or v > 0
