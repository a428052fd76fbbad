"""Small utility coverage: plotting helpers and the native async logger."""

import os

import numpy as np


def test_moving_average():
    from scripts.plot import moving_average

    x = np.arange(10, dtype=float)
    s = moving_average(x, 3)
    assert len(s) == 8
    np.testing.assert_allclose(s[0], 1.0)
    # window larger than data -> unchanged
    np.testing.assert_allclose(moving_average(x, 50), x)


def test_plot_reads_monitor_and_logs(tmp_path):
    from scripts.plot import read_logs, read_monitor

    mon = tmp_path / "log_file.monitor.csv"
    mon.write_text('#{"t_start": 0}\nr,l,t,s\n1.0,10,5.0,0.5\n2.0,11,6.0,0.6\n')
    rows = read_monitor(str(mon))
    assert rows[1]["s"] == 0.6

    logs = tmp_path / "logs.csv"
    logs.write_text("step,success_rate\n100,0.5\n200,0.7\n")
    rows = read_logs(str(logs))
    assert rows[1]["success_rate"] == 0.7


def test_native_async_logger(tmp_path):
    from deep_rl_grasping_tpu.runtime.native import AsyncCsvWriter

    p = str(tmp_path / "x.csv")
    w = AsyncCsvWriter(p, "a,b\n")
    for i in range(500):
        w.write(f"{i},{i * 2}\n")
    assert w.dropped == 0
    w.close()
    lines = open(p).read().splitlines()
    assert lines[0] == "a,b"
    assert len(lines) == 501
    assert lines[-1] == "499,998"
