"""Lexicon-constrained CTC beam decode + n-gram LM tests (the reference
SpeechLM inference stack: flashlight LexiconDecoder + KenLM, reference
SpeechLM/speechlm/infer.py:29-33,121).  Also covers the jittable n-gram
repeat block (reference sequence_generator.py:23,111-114)."""

import math

import numpy as np
import pytest

from speecht5_tpu.decode.lexicon import (
    NGramLM, lexicon_beam_py, lexicon_beam_nbest_py, LexiconDecoder,
)
from speecht5_tpu.data import native

BLANK, SEP, A, B = 0, 1, 2, 3
VOCAB = ["<blank>", "|", "a", "b"]
LN10 = math.log(10.0)


@pytest.fixture
def arpa(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(
        "\\data\\\n"
        "ngram 1=3\n"
        "ngram 2=1\n"
        "\n"
        "\\1-grams:\n"
        "-0.2\taa\t-0.4\n"
        "-1.5\tab\t-0.1\n"
        "-0.9\tba\n"
        "\n"
        "\\2-grams:\n"
        "-0.05\taa ab\n"
        "\n"
        "\\end\\\n"
    )
    return str(p)


@pytest.fixture
def lexicon_file(tmp_path):
    p = tmp_path / "lexicon.txt"
    p.write_text("aa\ta a\nab\ta b\nba\tb a\n")
    return str(p)


LEXICON = {"aa": [A, A], "ab": [A, B], "ba": [B, A]}


def soft_emissions(rows):
    """rows: list of [V] unnormalized positives -> log-softmax rows."""
    e = np.asarray(rows, np.float64)
    e = np.log(e / e.sum(-1, keepdims=True))
    return e.astype(np.float32)


class TestNGramLM:
    def test_backoff_score(self, arpa):
        lm = NGramLM(arpa)
        assert lm.order == 2
        # direct bigram hit
        s, ctx = lm.score(("aa",), "ab")
        np.testing.assert_allclose(s, -0.05 * LN10, rtol=1e-6)
        assert ctx == ("ab",)
        # backoff: P(ba | aa) = backoff(aa) + P(ba)
        s2, _ = lm.score(("aa",), "ba")
        np.testing.assert_allclose(s2, (-0.4 - 0.9) * LN10, rtol=1e-6)
        # no context
        s3, _ = lm.score((), "aa")
        np.testing.assert_allclose(s3, -0.2 * LN10, rtol=1e-6)


class TestLexiconBeamPy:
    def test_acoustic_best_without_lm(self):
        # 'a' then clearly 'b': acoustically "ab"
        lp = soft_emissions([
            [0.05, 0.05, 0.85, 0.05],
            [0.10, 0.05, 0.05, 0.80],
            [0.70, 0.10, 0.10, 0.10],
        ])
        toks, score = lexicon_beam_py(lp, LEXICON, BLANK, SEP, beam=20)
        assert toks == [A, B]
        assert np.isfinite(score)

    def test_lexicon_constrains_to_valid_words(self):
        # acoustically "bb" is best but no word spells b b -> decoder may not
        # produce it
        lp = soft_emissions([
            [0.05, 0.05, 0.05, 0.85],
            [0.70, 0.05, 0.05, 0.20],
            [0.05, 0.05, 0.05, 0.85],
        ])
        toks, _ = lexicon_beam_py(lp, LEXICON, BLANK, SEP, beam=20)
        assert toks != [B, B]

    def test_lm_changes_one_best(self, arpa):
        """Near-tie between "ab" and "aa"; the LM strongly prefers "aa"
        (-0.2 vs -1.5 log10) and must flip the 1-best."""
        lm = NGramLM(arpa)
        lp = soft_emissions([
            [0.02, 0.02, 0.94, 0.02],   # a
            [0.47, 0.02, 0.04, 0.47],   # blank vs b near-tie
            [0.10, 0.05, 0.45, 0.40],   # a vs b
        ])
        toks_no, _ = lexicon_beam_py(lp, LEXICON, BLANK, SEP, beam=20)
        assert toks_no == [A, B]
        toks_lm, _ = lexicon_beam_py(
            lp, LEXICON, BLANK, SEP, lm=lm, lm_weight=3.0, beam=20
        )
        assert toks_lm == [A, A]

    def test_hand_computed_single_word_score(self):
        """One word 'aa' with T=3: exact CTC forward score by hand.
        Valid alignments for tokens (a, a): a _ a only (repeat collapses).
        plus final-frame handling: paths a,_,a and with trailing repeats."""
        # tiny vocab: blank, sep, a  (use LEXICON with only 'aa')
        lp = soft_emissions([
            [0.2, 0.1, 0.7, 0.0001],
            [0.6, 0.1, 0.3, 0.0001],
            [0.2, 0.1, 0.7, 0.0001],
        ])
        lex = {"aa": [A, A]}
        toks, score = lexicon_beam_py(lp, lex, BLANK, SEP, beam=50)
        assert toks == [A, A]
        # alignments mapping to "aa" in 3 frames: (a, blank, a) only
        want = lp[0, A] + lp[1, BLANK] + lp[2, A]
        np.testing.assert_allclose(score, want, rtol=1e-5)


class TestNativeParity:
    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_cpp_matches_python(self, lexicon_file, arpa, rng):
        dec = LexiconDecoder(
            lexicon_file, VOCAB, arpa_path=arpa, blank=BLANK, sep=SEP,
            lm_weight=1.5, word_score=-0.3, beam=30,
        )
        lm = NGramLM(arpa)
        for trial in range(10):
            T = int(rng.integers(3, 9))
            e = rng.random((T, 4)) + 1e-3
            lp = np.log(e / e.sum(-1, keepdims=True)).astype(np.float32)
            want_toks, want_score = lexicon_beam_py(
                lp, LEXICON, BLANK, SEP, lm=lm, lm_weight=1.5,
                word_score=-0.3, beam=30,
            )
            got_toks, got_score = dec.decode(lp)
            assert got_toks == want_toks, f"trial {trial}"
            np.testing.assert_allclose(got_score, want_score, rtol=1e-4)

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_cpp_nbest_matches_python(self, lexicon_file, arpa, rng):
        """N-best finals (pass 1 of the lexicon-constrained attention
        rescore): same hypotheses, same order, same scores as the Python
        reference; row 0 equals the 1-best entry point."""
        dec = LexiconDecoder(
            lexicon_file, VOCAB, arpa_path=arpa, blank=BLANK, sep=SEP,
            lm_weight=1.5, word_score=-0.3, beam=30,
        )
        lm = NGramLM(arpa)
        for trial in range(10):
            T = int(rng.integers(3, 9))
            e = rng.random((T, 4)) + 1e-3
            lp = np.log(e / e.sum(-1, keepdims=True)).astype(np.float32)
            want = lexicon_beam_nbest_py(
                lp, LEXICON, BLANK, SEP, lm=lm, lm_weight=1.5,
                word_score=-0.3, beam=30, nbest=5,
            )
            got = dec.decode_nbest(lp, nbest=5)
            seqs = [tuple(t) for t, _ in got]
            assert len(seqs) == len(set(seqs)), "duplicate N-best sequences"
            assert len(got) == len(want), f"trial {trial}"
            for (gt, gs), (wt, ws) in zip(got, want):
                assert gt == wt, f"trial {trial}"
                np.testing.assert_allclose(gs, ws, rtol=1e-4)
            best_toks, best_score = dec.decode(lp)
            assert got[0][0] == best_toks
            np.testing.assert_allclose(got[0][1], best_score, rtol=1e-6)

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_cpp_no_lm(self, lexicon_file, rng):
        dec = LexiconDecoder(
            lexicon_file, VOCAB, blank=BLANK, sep=SEP, beam=30,
        )
        for _ in range(5):
            T = int(rng.integers(3, 8))
            e = rng.random((T, 4)) + 1e-3
            lp = np.log(e / e.sum(-1, keepdims=True)).astype(np.float32)
            want_toks, want_score = lexicon_beam_py(
                lp, LEXICON, BLANK, SEP, beam=30
            )
            got_toks, got_score = dec.decode(lp)
            assert got_toks == want_toks
            np.testing.assert_allclose(got_score, want_score, rtol=1e-4)


class TestModelToLexiconDecode:
    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_speechlm_ctc_emissions_through_decoder(self, tmp_path):
        """SpeechLM CTC fine-tune emissions -> native lexicon decoder, the
        reference's full inference stack (speechlm/infer.py + flashlight)."""
        import jax
        import jax.numpy as jnp
        from speecht5_tpu.models.speechlm import (
            SpeechLMModel, SpeechLMCtc, speechlm_tiny,
        )

        cfg = speechlm_tiny()
        model = SpeechLMCtc(cfg)
        wav = jnp.zeros((1, 4000))
        lengths = jnp.asarray([4000])
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, wav, lengths
        )
        logits, valid = model.apply(variables, wav, lengths)
        # tiny text vocab: treat ids as [blank=0, sep=1, letters 2..]
        V = logits.shape[-1]
        vocab = ["<blank>", "|"] + [chr(ord("a") + i) for i in range(V - 2)]
        lex = tmp_path / "lex.txt"
        lex.write_text("ab\ta b\nba\tb a\naa\ta a\n")
        dec = LexiconDecoder(
            str(lex), vocab, blank=0, sep=1, beam=10,
        )
        lp = np.asarray(
            jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        )[0][: int(np.asarray(valid).sum())]
        toks, score = dec.decode(lp)
        assert np.isfinite(score)
        # decoder output obeys the lexicon: only a(2)/b(3)/sep(1) tokens
        assert all(t in (1, 2, 3) for t in toks)


class TestNgramRepeatBlock:
    def test_bans_repeating_ngram(self):
        import jax.numpy as jnp
        from speecht5_tpu.decode.beam_search import ngram_repeat_mask

        # sequence: bos 5 6 5 -> with n=2, context at step 3 is (5,);
        # earlier bigram (5, 6) means 6 is banned next
        toks = jnp.asarray([[2, 5, 6, 5, 0, 0]])
        banned = np.asarray(
            ngram_repeat_mask(toks, jnp.asarray(3), 2, 8)
        )
        assert banned[0, 6]
        assert not banned[0, 5] and not banned[0, 7]

    def test_no_ban_without_repeat(self):
        import jax.numpy as jnp
        from speecht5_tpu.decode.beam_search import ngram_repeat_mask

        toks = jnp.asarray([[2, 5, 6, 7, 0, 0]])
        banned = np.asarray(
            ngram_repeat_mask(toks, jnp.asarray(3), 3, 8)
        )
        assert not banned.any()

    def test_trigram_ban(self):
        import jax.numpy as jnp
        from speecht5_tpu.decode.beam_search import ngram_repeat_mask

        # bos 4 5 6 4 5 -> context (4,5); earlier trigram (4,5,6) bans 6
        toks = jnp.asarray([[2, 4, 5, 6, 4, 5, 0, 0]])
        banned = np.asarray(
            ngram_repeat_mask(toks, jnp.asarray(5), 3, 8)
        )
        assert banned[0, 6]
        assert banned.sum() == 1


class TestBinaryLM:
    """Compiled-LM decode path (the reference decodes with KenLM-compiled
    binary LMs via flashlight, SpeechLM/speechlm/infer.py:29-33; here our
    own build_binary equivalent + magic-detected binary load)."""

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_binary_matches_arpa_decode(self, lexicon_file, arpa, tmp_path, rng):
        from speecht5_tpu.decode.lexicon import build_binary_lm

        bin_path = str(tmp_path / "lm.bin")
        build_binary_lm(arpa, bin_path)
        # binary is a real compiled artifact, not a text copy
        with open(bin_path, "rb") as f:
            head = f.read(8)
        assert head == b"S5NGLM\x01\n"

        kw = dict(blank=BLANK, sep=SEP, lm_weight=1.5, word_score=-0.3,
                  beam=30)
        dec_a = LexiconDecoder(lexicon_file, VOCAB, arpa_path=arpa, **kw)
        dec_b = LexiconDecoder(lexicon_file, VOCAB, arpa_path=bin_path, **kw)
        for trial in range(10):
            T = int(rng.integers(3, 9))
            e = rng.random((T, 4)) + 1e-3
            lp = np.log(e / e.sum(-1, keepdims=True)).astype(np.float32)
            toks_a, score_a = dec_a.decode(lp)
            toks_b, score_b = dec_b.decode(lp)
            assert toks_a == toks_b, f"trial {trial}"
            np.testing.assert_allclose(score_a, score_b, rtol=1e-6)

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_build_binary_rejects_missing_arpa(self, tmp_path):
        from speecht5_tpu.decode.lexicon import build_binary_lm

        with pytest.raises(RuntimeError, match="failed"):
            build_binary_lm(str(tmp_path / "absent.arpa"),
                            str(tmp_path / "o.bin"))


ARPA3 = """\\data\\
ngram 1=4
ngram 2=3
ngram 3=2

\\1-grams:
-0.2\taa\t-0.4
-1.5\tab\t-0.1
-0.9\tba\t-0.2
-2.0\t<unk>

\\2-grams:
-0.05\taa ab\t-0.3
-0.4\tab ba\t-0.15
-0.7\tba aa

\\3-grams:
-0.02\taa ab ba
-0.6\tab ba aa

\\end\\
"""


class TestKenLMBinary:
    """KenLM compiled-binary interop (reference SpeechLM decode recipes
    consume KenLM .bin artifacts directly, SpeechLM/README.md:105-121,
    speechlm/infer.py:29-33): prep lm-binary --format kenlm writes KenLM's
    probing layout (format version 5), and LexiconDecoder reads it by
    magic — scores identical to the ARPA and native-binary paths.  The
    order-3 fixture exercises the unigram array, a middle probing table,
    AND the longest-order table."""

    @pytest.fixture
    def arpa3(self, tmp_path):
        p = tmp_path / "lm3.arpa"
        p.write_text(ARPA3)
        return str(p)

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    @pytest.mark.parametrize("fixture", ["arpa", "arpa3"])
    def test_kenlm_binary_matches_arpa_decode(self, lexicon_file, fixture,
                                              tmp_path, rng, request):
        from speecht5_tpu.decode.lexicon import build_binary_lm

        arpa_path = request.getfixturevalue(fixture)
        kbin = str(tmp_path / "lm.kenlm.bin")
        build_binary_lm(arpa_path, kbin, format="kenlm")
        with open(kbin, "rb") as f:
            head = f.read(51)
        assert head == b"mmap lm http://kheafield.com/code format version 5\n"

        kw = dict(blank=BLANK, sep=SEP, lm_weight=1.5, word_score=-0.3,
                  beam=30)
        dec_a = LexiconDecoder(lexicon_file, VOCAB, arpa_path=arpa_path,
                               **kw)
        dec_k = LexiconDecoder(lexicon_file, VOCAB, arpa_path=kbin, **kw)
        for trial in range(15):
            T = int(rng.integers(3, 12))
            e = rng.random((T, 4)) + 1e-3
            lp = np.log(e / e.sum(-1, keepdims=True)).astype(np.float32)
            toks_a, score_a = dec_a.decode(lp)
            toks_k, score_k = dec_k.decode(lp)
            assert toks_a == toks_k, f"trial {trial}"
            np.testing.assert_allclose(score_a, score_k, rtol=1e-5)
            na = dec_a.decode_nbest(lp, nbest=5)
            nk = dec_k.decode_nbest(lp, nbest=5)
            assert [t for t, _ in na] == [t for t, _ in nk]

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_all_three_formats_score_identically(self, lexicon_file, arpa3,
                                                 tmp_path, rng):
        """The VERDICT r4 done-criterion: tiny ARPA -> scores via .arpa,
        our native binary, and the KenLM-format binary all identical."""
        from speecht5_tpu.decode.lexicon import build_binary_lm

        nbin = str(tmp_path / "lm.native.bin")
        kbin = str(tmp_path / "lm.kenlm.bin")
        build_binary_lm(arpa3, nbin)
        build_binary_lm(arpa3, kbin, format="kenlm")
        kw = dict(blank=BLANK, sep=SEP, lm_weight=1.5, word_score=-0.3,
                  beam=30)
        decs = [LexiconDecoder(lexicon_file, VOCAB, arpa_path=p, **kw)
                for p in (arpa3, nbin, kbin)]
        for _ in range(10):
            T = int(rng.integers(3, 10))
            e = rng.random((T, 4)) + 1e-3
            lp = np.log(e / e.sum(-1, keepdims=True)).astype(np.float32)
            outs = [d.decode(lp) for d in decs]
            assert outs[0][0] == outs[1][0] == outs[2][0]
            np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-6)
            np.testing.assert_allclose(outs[0][1], outs[2][1], rtol=1e-5)

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_prep_cli_kenlm_format(self, arpa, tmp_path):
        from speecht5_tpu.cli.prep import main as prep_main

        out = str(tmp_path / "cli.kenlm.bin")
        prep_main(["lm-binary", "--arpa", arpa, "--out", out,
                   "--format", "kenlm"])
        with open(out, "rb") as f:
            assert f.read(7) == b"mmap lm"


class TestGzippedArpa:
    """OpenSLR ships 4-gram.arpa.gz; both LM loaders accept it directly
    (reference SpeechLM/README.md:105 decode recipe artifact)."""

    def test_python_lm_reads_gz(self, arpa, tmp_path):
        import gzip
        import shutil

        gz = str(tmp_path / "lm.arpa.gz")
        with open(arpa, "rb") as f, gzip.open(gz, "wb") as o:
            shutil.copyfileobj(f, o)
        a, b = NGramLM(arpa), NGramLM(gz)
        assert a.order == b.order
        assert a.grams == b.grams

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_native_decoder_reads_gz(self, lexicon_file, arpa, tmp_path, rng):
        import gzip
        import shutil

        gz = str(tmp_path / "lm.arpa.gz")
        with open(arpa, "rb") as f, gzip.open(gz, "wb") as o:
            shutil.copyfileobj(f, o)
        kw = dict(blank=BLANK, sep=SEP, lm_weight=1.5, word_score=-0.3,
                  beam=30)
        dec_a = LexiconDecoder(lexicon_file, VOCAB, arpa_path=arpa, **kw)
        dec_b = LexiconDecoder(lexicon_file, VOCAB, arpa_path=gz, **kw)
        for _ in range(5):
            T = int(rng.integers(3, 9))
            e = rng.random((T, 4)) + 1e-3
            lp = np.log(e / e.sum(-1, keepdims=True)).astype(np.float32)
            assert dec_a.decode(lp) == dec_b.decode(lp)
