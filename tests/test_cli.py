"""End-to-end CLI integration: train overfits a tiny model on synthetic
utterances, evaluate beam-decodes them to low WER.  This is the integration
oracle the reference only had as README recipes (SpeechT5/README.md:80-246)."""

import json
import os

import numpy as np
import pytest

from speecht5_tpu.data.audio import write_wav


N_UTTS = 24
WORDS = ["HELLO", "WORLD", "ALOHA", "DATA", "RADAR", "LOL", "HAT", "DOLL"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """24 synthetic utterances; each utterance's waveform encodes its word
    identity as a deterministic band-limited signature so wav->text is
    learnable."""
    tmp = tmp_path_factory.mktemp("cli")
    root = tmp / "audio"
    root.mkdir()
    rng = np.random.default_rng(0)
    labels = []
    n = 6400  # ~20 conv-FE frames: slack for CTC alignments w/ doubled letters
    rows = []
    for i in range(N_UTTS):
        w = WORDS[i % len(WORDS)]
        # word-keyed signature + small noise
        t = np.arange(n) / 16000.0
        f = 200.0 + 120.0 * (i % len(WORDS))
        wav = 0.3 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(n)
        write_wav(str(root / f"u{i}.wav"), wav)
        rows.append(f"u{i}.wav\t{n}")
        labels.append(" ".join(list(w)) + " |")
    with open(tmp / "train.tsv", "w") as fh:
        fh.write(str(root) + "\n" + "\n".join(rows) + "\n")
    with open(tmp / "train.ltr", "w") as fh:
        fh.write("\n".join(labels) + "\n")
    letters = sorted(set("".join(WORDS))) + ["|"]
    with open(tmp / "dict.ltr.txt", "w") as fh:
        for s in letters:
            fh.write(f"{s} 100\n")
    return tmp


@pytest.mark.slow
def test_train_then_evaluate_overfit(corpus):
    from speecht5_tpu.cli.train import main as train_main
    from speecht5_tpu.cli.evaluate import main as eval_main

    save = corpus / "ckpt"
    common = [
        "--manifest", str(corpus / "train.tsv"),
        "--labels", str(corpus / "train.ltr"),
        "--dict", str(corpus / "dict.ltr.txt"),
        "--arch", "speecht5_tiny",
    ]
    train_main(common + [
        "--task", "s2t", "--save-dir", str(save),
        "--max-updates", "320", "--batch-size", "8",
        "--lr", "2e-3", "--warmup", "40", "--mask-prob", "0",
        "--label-smoothing", "0", "--save-interval", "320",
        "--log-interval", "80", "--ctc-weight", "0.5",
    ])
    result = eval_main(common + [
        "--task", "s2t", "--ckpt", str(save),
        "--beam", "2", "--max-len", "10", "--batch-size", "8",
        "--ctc-weight", "0.3",
    ])
    assert result["metric"] == "wer"
    assert result["n_utts"] == N_UTTS
    assert result["value"] < 0.10, f"overfit WER too high: {result}"

    # encoder-only CTC decoders over the same checkpoint (the reference
    # SpeechLM eval stack: infer_viterbi.yaml / flashlight lexicon decode).
    # Greedy collapses HELLO -> HELO (the classic CTC doubled-letter failure
    # when no blank lands between the L's); the lexicon decoder must recover
    # it because HELO is not a word.
    greedy = eval_main(common + [
        "--task", "s2t", "--ckpt", str(save),
        "--decoder", "ctc_greedy", "--batch-size", "8",
    ])
    assert greedy["decoder"] == "ctc_greedy"
    assert greedy["value"] < 0.20, f"ctc_greedy WER too high: {greedy}"

    # two-pass rescore: CTC N-best prefix beam + one teacher-forced decoder
    # forward.  The decoder pass must recover the doubled-letter confusions
    # greedy makes (HELLO -> HELO), matching the AR beam's WER at
    # encoder-forward cost.
    rescore = eval_main(common + [
        "--task", "s2t", "--ckpt", str(save),
        "--decoder", "ctc_rescore", "--batch-size", "8",
        "--ctc-weight", "0.3",
    ])
    assert rescore["decoder"] == "ctc_rescore"
    assert rescore["value"] <= greedy["value"], (greedy, rescore)
    assert rescore["value"] < 0.05, f"ctc_rescore WER too high: {rescore}"

    from speecht5_tpu.data import native
    if native.available():
        from speecht5_tpu.cli.prep import main as prep_main

        wrd = corpus / "words.wrd"
        wrd.write_text("\n".join(WORDS) + "\n")
        lex = corpus / "lexicon.txt"
        prep_main(["letter-lexicon", "-i", str(wrd), "-o", str(lex)])
        lexicon = eval_main(common + [
            "--task", "s2t", "--ckpt", str(save),
            "--decoder", "ctc_lexicon", "--lexicon", str(lex),
            "--batch-size", "8",
        ])
        # lexicon-constrained decode matches the AR beam (WER 0) and beats
        # greedy on the doubled-letter words
        assert lexicon["value"] < 0.05, (greedy, lexicon)
        assert lexicon["value"] <= greedy["value"], (greedy, lexicon)

        # lexicon-constrained N-best + attention rescore: pass 1 restricted
        # to valid-word hypotheses, pass 2 the decoder pick — the strongest
        # WER operating point (reference infer_fsqlm.yaml analogue)
        rescore_lex = eval_main(common + [
            "--task", "s2t", "--ckpt", str(save),
            "--decoder", "ctc_rescore", "--lexicon", str(lex),
            "--batch-size", "8", "--ctc-weight", "0.3",
        ])
        assert rescore_lex["value"] < 0.05, (lexicon, rescore_lex)


def test_validation_loop_with_ctc_wer(corpus, capsys):
    """Validation runs at --valid-interval and reports loss + greedy-CTC
    UER/WER (the reference's in-training WER,
    speech_to_text_loss.py:232-297)."""
    import json as _json
    from speecht5_tpu.cli.train import main as train_main

    save = corpus / "ckpt_valid"
    train_main([
        "--manifest", str(corpus / "train.tsv"),
        "--labels", str(corpus / "train.ltr"),
        "--dict", str(corpus / "dict.ltr.txt"),
        "--arch", "speecht5_tiny",
        "--task", "s2t", "--save-dir", str(save),
        "--max-updates", "8", "--batch-size", "8",
        "--mask-prob", "0", "--ctc-weight", "0.3",
        "--valid-manifest", str(corpus / "train.tsv"),
        "--valid-labels", str(corpus / "train.ltr"),
        "--valid-interval", "8", "--save-interval", "8",
        "--log-interval", "100",
        "--best-checkpoint-metric", "uer",
    ])
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    valid = [_json.loads(l) for l in lines if "valid_loss" in l]
    assert valid, f"no validation line in {lines}"
    v = valid[0]
    assert "valid_uer" in v and "valid_wer" in v
    assert 0.0 <= v["valid_wer"] <= 1.5
    assert v.get("new_best") == "uer"
    # best-metric checkpoint landed and evaluate --use-best can name it
    assert (save / "best").exists()


@pytest.mark.slow
def test_tts_train_then_evaluate(tmp_path, capsys):
    """t2s end-to-end: train a tiny TTS model briefly, evaluate MCD + focus
    rate through the CLI (reference generate_speech.py contract)."""
    import json as _json
    import numpy as np
    from speecht5_tpu.cli.train import main as train_main
    from speecht5_tpu.cli.evaluate import main as eval_main

    rng = np.random.default_rng(5)
    root = tmp_path / "audio"
    root.mkdir()
    spkdir = tmp_path / "spk"
    spkdir.mkdir()
    rows, labels = [], []
    n = 4000
    for i in range(8):
        t = np.arange(n) / 16000.0
        wav = 0.3 * np.sin(2 * np.pi * (220 + 40 * i) * t)
        write_wav(str(root / f"t{i}.wav"), wav)
        np.save(str(spkdir / f"t{i}.npy"),
                rng.standard_normal(16).astype(np.float32))
        rows.append(f"t{i}.wav\t{n}")
        labels.append("H I |")
    (tmp_path / "tts.tsv").write_text(
        str(root) + "\n" + "\n".join(rows) + "\n"
    )
    (tmp_path / "tts.txt").write_text("\n".join(labels) + "\n")
    (tmp_path / "d.txt").write_text("| 1\nH 1\nI 1\n")

    common = [
        "--manifest", str(tmp_path / "tts.tsv"),
        "--labels", str(tmp_path / "tts.txt"),
        "--dict", str(tmp_path / "d.txt"),
        "--arch", "speecht5_tiny",
    ]
    train_main(common + [
        "--task", "t2s", "--save-dir", str(tmp_path / "ck"),
        "--spkemb-dir", str(spkdir), "--guided-attn",
        "--max-updates", "6", "--batch-size", "8",
        "--save-interval", "6", "--log-interval", "3",
    ])
    result = eval_main(common + [
        "--task", "t2s", "--ckpt", str(tmp_path / "ck"),
        "--spkemb-dir", str(spkdir), "--batch-size", "8",
        "--results-path", str(tmp_path / "out"),
    ])
    assert result["metric"] == "mcd"
    assert np.isfinite(result["value"])
    assert 0.0 < result["focus_rate"] <= 1.0
    import os
    assert os.path.exists(tmp_path / "out" / "0.npy")


def test_joint_pretrain_multitask(tmp_path, capsys):
    """--task pretrain: joint speech+text pretraining with modality-pure
    interleaved batches sharing ONE optimizer state (reference
    MultitaskDataset + tasks/speecht5.py:396-517)."""
    import json as _json
    import numpy as np
    from speecht5_tpu.cli.train import main as train_main

    rng = np.random.default_rng(3)
    root = tmp_path / "audio"
    root.mkdir()
    n = 4000
    rows, kms = [], []
    for i in range(8):
        write_wav(str(root / f"p{i}.wav"), rng.standard_normal(n) * 0.1)
        rows.append(f"p{i}.wav\t{n}")
        kms.append(" ".join(str(x) for x in rng.integers(0, 16, 60)))
    (tmp_path / "pre.tsv").write_text(str(root) + "\n" + "\n".join(rows) + "\n")
    (tmp_path / "pre.km").write_text("\n".join(kms) + "\n")
    (tmp_path / "corpus.txt").write_text(
        "\n".join("H E L L O | W O R L D |" for _ in range(20)) + "\n"
    )
    (tmp_path / "dict.txt").write_text(
        "\n".join(f"{s} 5" for s in "| E H L O W R D") + "\n"
    )

    train_main([
        "--task", "pretrain", "--arch", "speecht5_tiny",
        "--manifest", str(tmp_path / "pre.tsv"),
        "--labels", str(tmp_path / "pre.km"),
        "--text-file", str(tmp_path / "corpus.txt"),
        "--dict", str(tmp_path / "dict.txt"),
        "--tokens-per-sample", "24",
        "--save-dir", str(tmp_path / "ckpt"),
        "--max-updates", "4", "--batch-size", "8",
        "--log-interval", "1", "--save-interval", "4",
    ])
    lines = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    keys = set().union(*[set(l) for l in lines])
    assert any(k.startswith("pretrain_speech/") for k in keys), keys
    assert any(k.startswith("pretrain_text/") for k in keys), keys
    losses = [v for l in lines for k, v in l.items() if k.endswith("/loss")]
    assert losses and all(np.isfinite(losses))


def test_train_resume(corpus):
    """Checkpoint/resume: a second invocation picks up at the saved step."""
    from speecht5_tpu.cli.train import main as train_main

    save = corpus / "ckpt_resume"
    argv = [
        "--manifest", str(corpus / "train.tsv"),
        "--labels", str(corpus / "train.ltr"),
        "--dict", str(corpus / "dict.ltr.txt"),
        "--arch", "speecht5_tiny",
        "--task", "s2t", "--save-dir", str(save),
        "--batch-size", "8", "--mask-prob", "0",
        "--save-interval", "8", "--log-interval", "100",
    ]
    train_main(argv + ["--max-updates", "8"])
    assert os.path.isdir(save / "8")
    train_main(argv + ["--max-updates", "16"])
    assert os.path.isdir(save / "16")


def test_apply_overrides():
    """Generic dotted-path config overrides (the CLI's access to every config
    field, replacing the reference's per-flag argparse surface)."""
    from speecht5_tpu import config as C

    cfg = C.speecht5_tiny()
    out = C.apply_overrides(cfg, [
        "sid.encoder_cls=True",
        "se_predict=masking",          # bare-string convenience
        "reduction_factor=1",
        "encoder.layerdrop=0.25",
    ])
    assert out.sid.encoder_cls is True
    assert out.se_predict == "masking"
    assert out.reduction_factor == 1
    assert out.encoder.layerdrop == 0.25
    # untouched fields and the original config are preserved
    assert out.decoder.layerdrop == cfg.decoder.layerdrop
    assert cfg.sid.encoder_cls is False

    import pytest as _pytest
    with _pytest.raises(AttributeError):
        C.apply_overrides(cfg, ["sid.not_a_field=1"])
    with _pytest.raises(ValueError):
        C.apply_overrides(cfg, ["malformed"])


def test_evaluate_data_parallel_matches(corpus):
    """--data-parallel shards each decode batch over the 8-device CPU mesh
    and must reproduce the single-device hypotheses exactly."""
    from speecht5_tpu.cli.train import main as train_main
    from speecht5_tpu.cli.evaluate import main as eval_main

    save = corpus / "ckpt_dp"
    common = [
        "--manifest", str(corpus / "train.tsv"),
        "--labels", str(corpus / "train.ltr"),
        "--dict", str(corpus / "dict.ltr.txt"),
        "--arch", "speecht5_tiny",
    ]
    train_main(common + [
        "--task", "s2t", "--save-dir", str(save),
        "--max-updates", "4", "--batch-size", "8",
        "--lr", "1e-3", "--warmup", "2", "--mask-prob", "0",
        "--save-interval", "4", "--log-interval", "4",
    ])
    eval_args = common + [
        "--task", "s2t", "--ckpt", str(save),
        "--beam", "2", "--max-len", "8", "--batch-size", "8",
        "--ctc-weight", "0.3",
    ]
    single = eval_main(eval_args + ["--results-path",
                                    str(corpus / "res_single")])
    dp = eval_main(eval_args + ["--data-parallel", "--results-path",
                                str(corpus / "res_dp")])
    assert single["n_utts"] == dp["n_utts"] == N_UTTS
    h1 = (corpus / "res_single" / "hyps.txt").read_text()
    h2 = (corpus / "res_dp" / "hyps.txt").read_text()
    assert h1 == h2
    assert abs(single["value"] - dp["value"]) < 1e-9


@pytest.mark.slow
def test_evaluate_with_fusion_lm(corpus, tmp_path, capsys):
    """evaluate --lm-ckpt: shallow LM fusion from the CLI (the reference's
    --lm-path decode, SpeechT5/README.md:241-244).  A tiny randomly
    initialized LM at small weight must run end-to-end and return a WER."""
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from speecht5_tpu.cli.train import main as train_main
    from speecht5_tpu.cli.evaluate import main as eval_main
    from speecht5_tpu.data.dictionary import Dictionary
    from speecht5_tpu.models.lm import TransformerLM, lm_tiny
    from speecht5_tpu.utils.checkpoint import CheckpointManager

    common = [
        "--manifest", str(corpus / "train.tsv"),
        "--labels", str(corpus / "train.ltr"),
        "--dict", str(corpus / "dict.ltr.txt"),
        "--arch", "speecht5_tiny",
    ]
    save = tmp_path / "ckpt_lm"
    train_main(common + [
        "--task", "s2t", "--save-dir", str(save),
        "--max-updates", "4", "--batch-size", "8",
        "--mask-prob", "0", "--save-interval", "4", "--log-interval", "100",
    ])
    # tiny fusion LM over the same vocab, saved as a model item
    vocab = len(Dictionary.load(
        str(corpus / "dict.ltr.txt"),
        extra_special_symbols=["<mask>", "<ctc_blank>"]))
    lm = TransformerLM(replace(lm_tiny(), vocab_size=vocab))
    lm_v = lm.init(jax.random.PRNGKey(7), jnp.zeros((1, 8), jnp.int32))
    lm_dir = tmp_path / "lm_ckpt"
    m = CheckpointManager(str(lm_dir))
    m.save_model_only(1, lm_v)
    m.wait()

    result = eval_main(common + [
        "--task", "s2t", "--ckpt", str(save),
        "--beam", "2", "--max-len", "10", "--batch-size", "8",
        "--lm-ckpt", str(lm_dir), "--lm-arch", "tiny",
        "--lm-weight", "0.2",
    ])
    out = capsys.readouterr().out
    assert "fusion LM loaded" in out
    assert result["metric"] == "wer" and np.isfinite(result["value"])


@pytest.fixture(scope="module")
def serve_ckpt(corpus, tmp_path_factory):
    """One brief training for all serve contract tests."""
    from speecht5_tpu.cli.train import main as train_main

    save = tmp_path_factory.mktemp("serve") / "ckpt_serve"
    train_main([
        "--manifest", str(corpus / "train.tsv"),
        "--labels", str(corpus / "train.ltr"),
        "--dict", str(corpus / "dict.ltr.txt"),
        "--arch", "speecht5_tiny",
        "--task", "s2t", "--save-dir", str(save),
        "--max-updates", "4", "--batch-size", "8",
        "--mask-prob", "0", "--save-interval", "4", "--log-interval", "100",
    ])
    return save


@pytest.mark.slow
@pytest.mark.parametrize(
    "decoder", ["beam", "ctc_greedy", "ctc_rescore", "ctc_rescore_lex"])
def test_serve_asr_http(corpus, serve_ckpt, decoder):
    """cli.serve: HTTP ASR endpoint — health check, WAV round-trip, chunked
    long audio, 413 caps, micro-batching — under ALL decode algorithms
    (joint beam, encoder-only CTC viterbi, two-pass CTC rescore, and the
    lexicon-constrained rescore arm)."""
    import http.client
    import io
    import signal as _signal
    import subprocess
    import sys as _sys
    import time as _time
    import wave

    save = serve_ckpt
    from conftest import cpu_subprocess_env

    extra = []
    if decoder == "ctc_rescore_lex":
        from speecht5_tpu.data import native

        if not native.available():
            pytest.skip("lexicon decoder needs the native library")
        from speecht5_tpu.cli.prep import main as prep_main

        wrd = corpus / "serve_words.wrd"
        wrd.write_text("\n".join(WORDS) + "\n")
        lex = corpus / "serve_lexicon.txt"
        prep_main(["letter-lexicon", "-i", str(wrd), "-o", str(lex)])
        decoder = "ctc_rescore"
        extra = ["--lexicon", str(lex)]

    env = cpu_subprocess_env()
    proc = subprocess.Popen(
        [_sys.executable, "-u", "-m", "speecht5_tpu.cli.serve",
         "--task", "s2t", "--arch", "speecht5_tiny",
         "--ckpt", str(save), "--dict", str(corpus / "dict.ltr.txt"),
         "--decoder", decoder, *extra,
         "--port", "0", "--beam", "2", "--max-len", "8",
         "--asr-buckets", "1", "--dtype", "float32",
         "--max-batch", "3", "--batch-window-ms", "150",
         "--chunk-overlap-s", "0.25", "--max-audio-s", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    try:
        port = None
        t0 = _time.time()
        while _time.time() - t0 < 600:
            line = proc.stdout.readline()
            assert line, "server exited early"
            if '"serving": true' in line:
                port = json.loads(line)["port"]
                break
        assert port, "no serving line"

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        health = json.loads(r.read())
        assert r.status == 200 and health["ok"] and health["asr"]

        # round-trip a fixture utterance
        wav_path = None
        root = corpus / "audio"
        wav_path = sorted(root.glob("*.wav"))[0]
        body = wav_path.read_bytes()
        conn.request("POST", "/asr", body=body,
                     headers={"Content-Length": str(len(body))})
        r = conn.getresponse()
        out = json.loads(r.read())
        assert r.status == 200, out
        assert isinstance(out["text"], str)

        # malformed body -> clean 500 with an error, server stays up
        conn.request("POST", "/asr", body=b"notawav",
                     headers={"Content-Length": "7"})
        r = conn.getresponse()
        assert r.status == 500 and "error" in json.loads(r.read())
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200

        def wav_bytes(seconds):
            import numpy as _np
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                t = _np.arange(int(seconds * 16000)) / 16000.0
                pcm = (0.2 * _np.sin(2 * _np.pi * 300 * t) * 32767)
                w.writeframes(pcm.astype(_np.int16).tobytes())
            return buf.getvalue()

        def post(body, timeout=300):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
            c.request("POST", "/asr", body=body,
                      headers={"Content-Length": str(len(body))})
            r = c.getresponse()
            return r.status, json.loads(r.read())

        # audio past the largest bucket (1s) is chunked, NOT truncated:
        # 2.5s with 0.25s overlap -> 3 windows, all decoded, 200 OK
        conn.request("GET", "/healthz")
        before = json.loads(conn.getresponse().read())
        status, out = post(wav_bytes(2.5))
        assert status == 200 and isinstance(out["text"], str)
        conn.request("GET", "/healthz")
        after = json.loads(conn.getresponse().read())
        assert after["asr_requests"] - before["asr_requests"] >= 3

        # over the --max-audio-s cap -> 413, never a partial 200
        status, out = post(wav_bytes(5.0))
        assert status == 413 and "error" in out

        # micro-batching: concurrent same-bucket requests coalesce into
        # fewer device programs than requests
        import threading as _threading
        conn.request("GET", "/healthz")
        before = json.loads(conn.getresponse().read())
        results = [None] * 3
        body1 = wav_bytes(0.9)

        def worker(i):
            results[i] = post(body1)

        threads = [_threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r[0] == 200 for r in results), results
        conn.request("GET", "/healthz")
        after = json.loads(conn.getresponse().read())
        dreq = after["asr_requests"] - before["asr_requests"]
        dcall = after["asr_calls"] - before["asr_calls"]
        assert dreq == 3
        assert dcall < dreq, (before, after)
    finally:
        proc.send_signal(_signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


@pytest.mark.slow
def test_serve_tts_http(corpus, tmp_path):
    """cli.serve /tts: text -> in-graph HiFi-GAN -> WAV over HTTP (vocoder
    loaded from a checkpoint dir)."""
    import http.client
    import io
    import signal as _signal
    import subprocess
    import sys as _sys
    import time as _time
    import wave

    import jax
    import jax.numpy as jnp

    from speecht5_tpu.cli.train import main as train_main
    from speecht5_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from speecht5_tpu.utils.checkpoint import CheckpointManager

    save = tmp_path / "ckpt_tts_serve"
    train_main([
        "--manifest", str(corpus / "train.tsv"),
        "--labels", str(corpus / "train.ltr"),
        "--dict", str(corpus / "dict.ltr.txt"),
        "--arch", "speecht5_tiny",
        "--task", "t2s", "--save-dir", str(save),
        "--max-updates", "4", "--batch-size", "8",
        "--mask-prob", "0", "--save-interval", "4", "--log-interval", "100",
    ])
    # random vocoder checkpoint at serve's template topology (the default
    # HiFiGANConfig; the converter would fill real weights)
    n_mels = 20  # speecht5_tiny mel dim
    voc = HiFiGANGenerator(HiFiGANConfig(in_dim=n_mels))
    voc_vars = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, n_mels)))
    voc_dir = tmp_path / "voc"
    m = CheckpointManager(str(voc_dir))
    m.save_model_only(1, voc_vars)
    m.wait()

    from conftest import cpu_subprocess_env

    proc = subprocess.Popen(
        [_sys.executable, "-u", "-m", "speecht5_tpu.cli.serve",
         "--task", "t2s", "--arch", "speecht5_tiny",
         "--ckpt", str(save), "--dict", str(corpus / "dict.ltr.txt"),
         "--vocoder-ckpt", str(voc_dir),
         "--port", "0", "--max-frames", "64", "--tts-bucket-tokens", "16",
         "--max-batch", "2", "--batch-window-ms", "200",
         "--dtype", "float32"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=cpu_subprocess_env(),
    )
    try:
        port = None
        t0 = _time.time()
        while _time.time() - t0 < 600:
            line = proc.stdout.readline()
            assert line, "server exited early"
            if '"serving": true' in line:
                port = json.loads(line)["port"]
                break
        assert port, "no serving line"
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        body = json.dumps({"text": "HELLO WORLD"}).encode()
        conn.request("POST", "/tts", body=body,
                     headers={"Content-Length": str(len(body))})
        r = conn.getresponse()
        assert r.status == 200, r.read()[:500]
        assert r.getheader("Content-Type") == "audio/wav"
        with wave.open(io.BytesIO(r.read())) as w:
            assert w.getframerate() == 16000
            assert w.getnframes() > 0

        # text past --tts-bucket-tokens -> 413, never a silent truncation
        long_body = json.dumps({"text": "HELLO WORLD " * 20}).encode()
        conn.request("POST", "/tts", body=long_body,
                     headers={"Content-Length": str(len(long_body))})
        r = conn.getresponse()
        body413 = r.read()
        assert r.status == 413, body413[:200]
        assert "error" in json.loads(body413)

        # concurrent /tts requests coalesce into one batched AR decode:
        # device programs launched < requests served (observable counters)
        import threading as _threading

        conn.request("GET", "/healthz")
        before = json.loads(conn.getresponse().read())
        results = [None, None]

        def post_tts(i, text):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            b = json.dumps({"text": text}).encode()
            c.request("POST", "/tts", body=b,
                      headers={"Content-Length": str(len(b))})
            rr = c.getresponse()
            results[i] = (rr.status, rr.read())
            c.close()

        threads = [
            _threading.Thread(target=post_tts, args=(i, t))
            for i, t in enumerate(("HELLO", "WORLD"))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for status, data in results:
            assert status == 200, data[:200]
            with wave.open(io.BytesIO(data)) as w:
                assert w.getnframes() > 0
        conn.request("GET", "/healthz")
        after = json.loads(conn.getresponse().read())
        calls = after["tts_calls"] - before["tts_calls"]
        reqs = after["tts_requests"] - before["tts_requests"]
        assert reqs == 2, (before, after)
        assert calls < reqs, f"no TTS batching: {calls} calls / {reqs} reqs"
    finally:
        proc.send_signal(_signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_serve_tts_griffin_lim(corpus, tmp_path):
    """cli.serve /tts --griffin-lim: WAV over HTTP with NO vocoder
    checkpoint (host-side mel inversion, ops/mel.mel_to_audio)."""
    import http.client
    import io
    import signal as _signal
    import subprocess
    import sys as _sys
    import time as _time
    import wave

    from speecht5_tpu.cli.train import main as train_main

    save = tmp_path / "ckpt_tts_gl"
    train_main([
        "--manifest", str(corpus / "train.tsv"),
        "--labels", str(corpus / "train.ltr"),
        "--dict", str(corpus / "dict.ltr.txt"),
        "--arch", "speecht5_tiny",
        "--task", "t2s", "--save-dir", str(save),
        "--max-updates", "4", "--batch-size", "8",
        "--mask-prob", "0", "--save-interval", "4", "--log-interval", "100",
    ])
    from conftest import cpu_subprocess_env

    proc = subprocess.Popen(
        [_sys.executable, "-u", "-m", "speecht5_tpu.cli.serve",
         "--task", "t2s", "--arch", "speecht5_tiny",
         "--ckpt", str(save), "--dict", str(corpus / "dict.ltr.txt"),
         "--griffin-lim",
         "--port", "0", "--max-frames", "64", "--tts-bucket-tokens", "16",
         "--dtype", "float32"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=cpu_subprocess_env(),
    )
    try:
        port = None
        t0 = _time.time()
        while _time.time() - t0 < 600:
            line = proc.stdout.readline()
            assert line, "server exited early"
            if '"serving": true' in line:
                port = json.loads(line)["port"]
                break
        assert port, "no serving line"
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        body = json.dumps({"text": "HELLO"}).encode()
        conn.request("POST", "/tts", body=body,
                     headers={"Content-Length": str(len(body))})
        r = conn.getresponse()
        assert r.status == 200, r.read()[:500]
        assert r.getheader("Content-Type") == "audio/wav"
        with wave.open(io.BytesIO(r.read())) as w:
            assert w.getframerate() == 16000
            assert w.getnframes() > 0
    finally:
        proc.send_signal(_signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_serve_transcript_seam_join():
    """Chunked decode joins on word seams: text re-decoded inside the
    overlap window appears once, non-matching seams are left intact."""
    from speecht5_tpu.cli.serve import Service

    j = Service._join_transcripts
    assert j(["HELLO WORLD", "WORLD AGAIN"]) == "HELLO WORLD AGAIN"
    assert j(["A B C D", "C D E", "E F"]) == "A B C D E F"
    assert j(["HELLO", "", "WORLD"]) == "HELLO WORLD"
    # no false merge when the boundary words differ
    assert j(["A B", "C D"]) == "A B C D"
    # repeated-word utterances only drop the true seam
    assert j(["GO GO GO", "GO GO STOP"]) == "GO GO GO STOP"
