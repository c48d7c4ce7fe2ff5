"""Multi-host distributed training integration (parallel/distributed.py).

The reference trains multi-node DDP at --distributed-world-size 32
(reference SpeechT5/README.md:92-94).  The TPU-native equivalent is
jax.distributed + one global mesh; here it runs as TWO local CPU processes
with gloo collectives (4 virtual devices each) and must reproduce the
single-process 8-device loss trajectory exactly — same global batches, same
rng, different process topology.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    # hermetic CPU env: strips the parent session's TPU-plugin state,
    # which would otherwise make children attach to the remote relay at
    # startup and hang when the pool is unreachable (conftest helper)
    from conftest import cpu_subprocess_env

    env = cpu_subprocess_env()
    # workers set their own platform/device count
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def _run_workers(num_processes, local_devices, extra=(), timeout=900):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             "--process-id", str(i),
             "--num-processes", str(num_processes),
             "--port", str(port),
             "--local-devices", str(local_devices), *extra],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=_clean_env(),
        )
        for i in range(num_processes)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-4000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))
    return results


@pytest.mark.slow
class TestTwoProcessTraining:
    def test_matches_single_process(self):
        """2 processes x 4 devices == 1 process x 8 devices, to the digit
        (f32 CPU; identical global batches and rng)."""
        two = _run_workers(2, 4)
        one = _run_workers(1, 8)
        assert all(r["n_devices"] == 8 for r in two)
        # both workers observe the same replicated loss
        np.testing.assert_allclose(two[0]["losses"], two[1]["losses"],
                                   rtol=1e-6)
        # and the topology doesn't change the math
        np.testing.assert_allclose(two[0]["losses"], one[0]["losses"],
                                   rtol=1e-4)
        # training made progress
        assert two[0]["losses"][-1] < two[0]["losses"][0]

    def test_fsdp_two_process(self):
        """ZeRO-sharded state over a cross-process mesh: same losses as the
        plain-DP two-process run."""
        plain = _run_workers(2, 4)
        fsdp = _run_workers(2, 4, extra=("--fsdp",))
        np.testing.assert_allclose(fsdp[0]["losses"], plain[0]["losses"],
                                   rtol=1e-4)

    def test_tensor_parallel_two_process(self):
        """Megatron-split params on a 4x2 mesh spanning two processes:
        the TP collectives cross the gloo boundary and the losses still
        match plain DP (looser tolerance — TP changes reduction order)."""
        plain = _run_workers(2, 4)
        tp = _run_workers(2, 4, extra=("--n-model", "2"))
        np.testing.assert_allclose(tp[0]["losses"], plain[0]["losses"],
                                   rtol=2e-3)


class TestHelpers:
    def test_process_rows_single(self):
        from speecht5_tpu.parallel import distributed as D

        # single-process: the whole batch
        assert D.process_rows(8) == slice(0, 8)

    def test_unify_batch_shapes_noop_single(self):
        from speecht5_tpu.parallel import distributed as D

        b = {"x": np.zeros((2, 3))}
        assert D.unify_batch_shapes(b) is b

    def test_allsum_single(self):
        from speecht5_tpu.parallel import distributed as D

        assert D.allsum_scalars({"a": 2.0}) == {"a": 2.0}


def _write_corpus(tmp):
    """Tiny synthetic wav corpus (the test_cli.py fixture, inlined so this
    module stays subprocess-friendly)."""
    from speecht5_tpu.data.audio import write_wav

    words = ["HELLO", "WORLD", "ALOHA", "DATA", "RADAR", "LOL", "HAT",
             "DOLL"]
    root = tmp / "audio"
    root.mkdir()
    rng = np.random.default_rng(0)
    rows, labels = [], []
    n = 4000
    for i in range(16):
        w = words[i % len(words)]
        t = np.arange(n) / 16000.0
        f = 200.0 + 120.0 * (i % len(words))
        wav = 0.3 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(n)
        write_wav(str(root / f"u{i}.wav"), wav)
        rows.append(f"u{i}.wav\t{n}")
        labels.append(" ".join(list(w)) + " |")
    (tmp / "train.tsv").write_text(str(root) + "\n" + "\n".join(rows) + "\n")
    (tmp / "train.ltr").write_text("\n".join(labels) + "\n")
    letters = sorted(set("".join(words))) + ["|"]
    (tmp / "dict.ltr.txt").write_text(
        "\n".join(f"{s} 100" for s in letters) + "\n")


def _cli_args(tmp, save, extra=()):
    return [
        "-m", "speecht5_tpu.cli.train",
        "--manifest", str(tmp / "train.tsv"),
        "--labels", str(tmp / "train.ltr"),
        "--dict", str(tmp / "dict.ltr.txt"),
        "--arch", "speecht5_tiny", "--task", "s2t",
        "--save-dir", str(save),
        "--max-updates", "4", "--batch-size", "8",
        "--mask-prob", "0", "--ctc-weight", "0.3",
        "--valid-manifest", str(tmp / "train.tsv"),
        "--valid-labels", str(tmp / "train.ltr"),
        "--valid-interval", "4", "--save-interval", "100",
        "--log-interval", "100", "--rng-impl", "threefry2x32",
        "--best-checkpoint-metric", "uer", *extra,
    ]


def _final_json(out):
    for line in reversed(out.splitlines()):
        if line.startswith("{") and '"done"' in line:
            return json.loads(line)
    raise AssertionError(f"no done line:\n{out[-4000:]}")


@pytest.mark.slow
def test_cli_two_process_matches_single(tmp_path):
    """Full CLI path — process-sharded manifest loading, cross-host shape
    unification, validation-count reduction, rank-0 logging — two gloo
    processes x 4 devices vs one process x 8 devices."""
    _write_corpus(tmp_path)
    port = _free_port()
    env2 = _clean_env()
    env2["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env2["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, *_cli_args(
                tmp_path, tmp_path / "ck2",
                extra=("--distributed-coordinator", f"127.0.0.1:{port}",
                       "--distributed-num-processes", "2",
                       "--distributed-process-id", str(i),
                       "--distributed-platform", "cpu"))],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env2,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-5000:]}"

    env1 = _clean_env()
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env1["JAX_PLATFORMS"] = "cpu"
    single = subprocess.run(
        [sys.executable, *_cli_args(tmp_path, tmp_path / "ck1")],
        capture_output=True, text=True, timeout=1200, env=env1,
    )
    assert single.returncode == 0, single.stdout[-5000:] + single.stderr[-2000:]

    two = [_final_json(o) for o in outs]
    one = _final_json(single.stdout)
    # same final loss across the two workers and vs the single-process run
    assert two[0]["final_loss"] == pytest.approx(two[1]["final_loss"],
                                                 rel=1e-5)
    assert two[0]["final_loss"] == pytest.approx(one["final_loss"], rel=1e-3)
    # only rank 0 logged validation; it carries the reduced WER counts
    v0 = [l for l in outs[0].splitlines() if '"valid_uer"' in l]
    v1 = [l for l in outs[1].splitlines() if '"valid_uer"' in l]
    assert v0 and not v1
    # best-metric checkpoint written under the shared save dir
    assert (tmp_path / "ck2" / "best").exists()


@pytest.mark.slow
def test_preemption_sigterm_saves_and_resumes(tmp_path):
    """SIGTERM mid-run saves a full resumable checkpoint at the next step
    boundary and exits 0; a relaunch resumes from the saved step (the
    reference loses everything since the last --save-interval-updates)."""
    import signal as _signal
    import time as _time

    _write_corpus(tmp_path)
    env = _clean_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    args = [sys.executable, "-u", *_cli_args(tmp_path, tmp_path / "ck")]
    # long run we will interrupt: raise max-updates, drop validation
    args[args.index("--max-updates") + 1] = "500"
    args[args.index("--valid-interval") + 1] = "1000"
    args[args.index("--log-interval") + 1] = "1"
    p = subprocess.Popen(args, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, env=env)
    # wait until it has taken a couple of steps, then SIGTERM
    saw_step = False
    t0 = _time.time()
    lines = []
    while _time.time() - t0 < 900:
        line = p.stdout.readline()
        if not line:
            break
        lines.append(line)
        if '"step": 2' in line:
            saw_step = True
            p.send_signal(_signal.SIGTERM)
            break
    assert saw_step, "".join(lines)[-3000:]
    out, _ = p.communicate(timeout=600)
    lines.append(out)
    all_out = "".join(lines)
    assert p.returncode == 0, all_out[-3000:]
    pre = [json.loads(l) for l in all_out.splitlines()
           if l.startswith("{") and '"preempted"' in l]
    assert pre and pre[0]["step"] >= 2, all_out[-3000:]

    # relaunch: must resume at the preempted step, not from scratch
    args[args.index("--max-updates") + 1] = str(pre[0]["step"] + 2)
    r = subprocess.run(args, capture_output=True, text=True, timeout=900,
                       env=env)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-1000:]
    assert f"resumed at step {pre[0]['step']}" in r.stdout, r.stdout[-3000:]
    fin = _final_json(r.stdout)
    assert fin["steps"] == pre[0]["step"] + 2
