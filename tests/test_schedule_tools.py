"""Unit tests for the unattended chip-queue decision scripts.

scripts_dev/run_queue.sh runs pick_schedule.py / pick_block.py /
apply_schedule.py with nobody watching; a parsing or editing bug there
silently flips the default configs to a wrong physics schedule before the
headline bench. These tests lock the log formats (physics_cost_sweep.py /
kernel_bench.py print lines) and the YAML edit round-trip.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SD = os.path.join(REPO, "scripts_dev")


def run(script, *argv):
    out = subprocess.run(
        [sys.executable, os.path.join(SD, script), *argv],
        capture_output=True, text=True, timeout=60,
    )
    return out.stdout.strip(), out.returncode


SWEEP_LINE = ("{name:<34} step {ms:7.2f} ms ({sps:8.0f} st/s)  "
              "expert lam0 {r0:.1f}% ({n0} ep)  lam1 {r1:.1f}% ({n1} ep)")


def sweep_log(tmp_path, rows):
    p = tmp_path / "sweep.log"
    p.write_text("\n".join(SWEEP_LINE.format(**r) for r in rows) + "\n")
    return str(p)


def row(name, ms, r0=100.0, r1=100.0, n0=200, n1=200):
    return dict(name=name, ms=ms, sps=1024 / ms * 1e3, r0=r0, n0=n0,
                r1=r1, n1=n1)


class TestPickSchedule:
    def test_cheapest_passing_variant_wins(self, tmp_path):
        log = sweep_log(tmp_path, [
            row("default 48ss/8it/14pad dt240", 40.0),
            row("dt120    24ss/8it/14pad dt120", 22.0),
            row("dt120it6pad8 24ss/6it/8pad", 15.0),
            row("dt80it6pad8  16ss/6it/8pad dt80", 9.0, r1=97.5),
        ])
        out, rc = run("pick_schedule.py", log)
        assert rc == 0
        # dt80 failed the lam1 gate; dt120it6pad8 is the cheapest passer
        assert out == "dt120it6pad8"

    def test_min_episode_gate(self, tmp_path):
        log = sweep_log(tmp_path, [
            row("dt120it4pad6 24ss/4it/6pad", 8.0, n1=12),
            row("it6pad8  48ss/6it/8pad", 30.0),
        ])
        out, _ = run("pick_schedule.py", log)
        assert out == "it6pad8"  # 12 episodes < --min-ep 50

    def test_none_pass_prints_default(self, tmp_path):
        log = sweep_log(tmp_path, [
            row("dt120    24ss/8it/14pad dt120", 22.0, r0=95.0),
        ])
        out, _ = run("pick_schedule.py", log)
        assert out == "default"

    def test_missing_log_prints_default(self, tmp_path):
        out, rc = run("pick_schedule.py", str(tmp_path / "nope.log"))
        assert (out, rc) == ("default", 0)

    def test_real_cpu_precheck_line_parses(self, tmp_path):
        # exact line shape observed in /tmp/sweep_cpu.log on 2026-08-18
        p = tmp_path / "real.log"
        p.write_text(
            "dt120    24ss/8it/14pad dt120      step 2893.89 ms "
            "(      17 st/s)  expert lam0 100.0% (219 ep)  "
            "lam1 100.0% (193 ep)\n")
        out, _ = run("pick_schedule.py", str(p))
        assert out == "dt120"


class TestPickBlock:
    def write(self, tmp_path, text):
        p = tmp_path / "kernel.log"
        p.write_text(text)
        return str(p)

    def test_fastest_block_beyond_threshold(self, tmp_path):
        log = self.write(tmp_path, textwrap.dedent("""\
            block_e=128: 10.0 ms per 48-substep run
            block_e=256: 8.0 ms per 48-substep run
            block_e=512: 9.5 ms per 48-substep run
        """))
        out, _ = run("pick_block.py", log)
        assert out == "256"

    def test_within_noise_keeps_default(self, tmp_path):
        log = self.write(tmp_path, textwrap.dedent("""\
            block_e=128: 10.0 ms per 48-substep run
            block_e=256: 9.8 ms per 48-substep run
        """))
        out, _ = run("pick_block.py", log)
        assert out == "128"  # 2% faster is inside the 3% noise bar

    def test_failed_rows_ignored(self, tmp_path):
        log = self.write(tmp_path, textwrap.dedent("""\
            block_e=128: 10.0 ms per 48-substep run
            block_e=1024: FAILED XlaRuntimeError: RESOURCE_EXHAUSTED
        """))
        out, _ = run("pick_block.py", log)
        assert out == "128"

    def test_missing_or_empty_log(self, tmp_path):
        out, _ = run("pick_block.py", str(tmp_path / "nope.log"))
        assert out == "128"


TPU_BLOCK = textwrap.dedent("""\
    robot:
      model_path: models/gripper/wsg50_one_motor_gripper_new.sdf
    tpu:
      num_envs: 128
      # Scripted-expert replay seeding
      demo_frames: 100000
      stop_at_sr: 0.99
    SAC:
      layers: [64, 64]
""")


class TestApplySchedule:
    def write_cfg(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text(TPU_BLOCK)
        return str(p)

    def load(self, path):
        sys.path.insert(0, REPO)
        from deep_rl_grasping_tpu.utils import io_utils
        return io_utils.load_yaml(path)

    def test_apply_then_revert_round_trips(self, tmp_path):
        cfg = self.write_cfg(tmp_path)
        _, rc = run("apply_schedule.py", "dt120it6pad8",
                    "--extra", "block_e=256", "--files", cfg)
        assert rc == 0
        c = self.load(cfg)
        t = c["tpu"]
        assert t["gripper_substeps"] == 24 and t["move_substeps"] == 12
        assert t["solver_iterations"] == 6 and t["pad_inner_iterations"] == 8
        assert t["block_e"] == 256
        assert abs(t["dt"] - 1.0 / 120.0) < 1e-12
        # untouched keys survive, other sections intact
        assert t["num_envs"] == 128 and t["demo_frames"] == 100000
        assert c["SAC"]["layers"] == [64, 64]

        _, rc = run("apply_schedule.py", "revert", "--files", cfg)
        assert rc == 0
        t = self.load(cfg)["tpu"]
        for k in ("dt", "gripper_substeps", "move_substeps",
                  "solver_iterations", "pad_inner_iterations", "block_e"):
            assert k not in t
        assert t["num_envs"] == 128 and t["stop_at_sr"] == 0.99

    def test_apply_is_idempotent(self, tmp_path):
        cfg = self.write_cfg(tmp_path)
        run("apply_schedule.py", "dt120", "--files", cfg)
        run("apply_schedule.py", "dt120it4pad6", "--files", cfg)
        t = self.load(cfg)["tpu"]
        # second apply replaces the first wholesale (no stale dt120 keys)
        assert t["solver_iterations"] == 4 and t["pad_inner_iterations"] == 6
        with open(cfg) as f:
            body = f.read()
        assert body.count("physics schedule") == 1

    def test_revert_with_block_extra_keeps_block(self, tmp_path):
        # the queue's BEST=default, BE!=128 path: apply revert --extra block_e
        cfg = self.write_cfg(tmp_path)
        run("apply_schedule.py", "dt120", "--files", cfg)
        run("apply_schedule.py", "revert", "--extra", "block_e=512",
            "--files", cfg)
        t = self.load(cfg)["tpu"]
        assert t["block_e"] == 512
        assert "dt" not in t and "solver_iterations" not in t

    def test_unknown_variant_rejected(self, tmp_path):
        cfg = self.write_cfg(tmp_path)
        _, rc = run("apply_schedule.py", "dt999", "--files", cfg)
        assert rc != 0
        assert self.load(cfg)["tpu"].get("dt") is None

    def test_variant_names_cover_sweep(self):
        """Every sweep variant key must be applyable (queue feeds the first
        token of the sweep line straight into apply_schedule)."""
        sys.path.insert(0, SD)
        import importlib
        ap = importlib.import_module("apply_schedule")
        sweep_names = ["pad8", "it6pad8", "it4pad8", "dt120",
                       "dt120it6pad8", "dt120it4pad6", "dt80it6pad8",
                       "dt80it4pad6"]
        for n in sweep_names:
            assert n in ap.SCHEDULES, n
