"""WavLLM SFT recipe: reference-format TSV -> LoRA-only AdamW -> greedy decode.

Mirrors the reference SFT stage (WavLLM/wavllm/scripts/finetune_sft... flags;
model contract speechllm_model.py:131-136 freezes the LLaMA trunk + audio
encoders and trains LoRA/adapters only). Runnable as-is on the shipped
reference fixtures with the tiny topology:

    python recipes/wavllm_sft.py \\
        --tsv /root/reference/WavLLM/wavllm/test_data/asr.tsv \\
        --audio-root /root/reference/WavLLM/wavllm/test_data/audio \\
        --steps 5

For the real model: convert the released components first
(``python -m speecht5_tpu.cli.convert --format hf --component {wavlm,whisper,
llama}``), load them with utils.checkpoint.partial_load, pass a real LLaMA
sentencepiece tokenizer, and use WavLLMConfig at the released dimensions.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def byte_tokenizer(vocab_size):
    def tok(text):
        return [4 + (b % (vocab_size - 4)) for b in text.encode("utf-8")]
    return tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsv", required=True)
    ap.add_argument("--audio-root", default="")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--max-frames", type=int, default=100)
    ap.add_argument("--max-target", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import traverse_util
    from speecht5_tpu.data.wavllm import WavLLMDataset
    from speecht5_tpu.models.wavllm import (
        WavLLMModel, wavllm_tiny, lora_param_filter,
    )

    cfg = wavllm_tiny(n_mels=80)
    ds = WavLLMDataset(args.tsv, byte_tokenizer(cfg.vocab_size),
                       audio_root=args.audio_root)

    items = []
    for i in range(len(ds)):
        it = ds[i]
        items.append(dict(
            it,
            wav=it["wav"][: args.max_frames * 160],
            mel=it["mel"][: args.max_frames],
            target_tokens=it["target_tokens"][: args.max_target],
        ))
    batch = {k: jnp.asarray(v) for k, v in ds.collate(items).items()}

    model = WavLLMModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch["mel"], batch["mel_lengths"],
        batch["prompt_tokens"], batch["target_tokens"], batch["wav"],
        batch["wav_lengths"], batch["left_tokens"], method="forward_sft",
    )
    params = variables["params"]

    # LoRA-only optimization: trunk/encoder params get zero updates
    flat = traverse_util.flatten_dict(params)
    labels = traverse_util.unflatten_dict(
        {k: ("lora" if lora_param_filter(k) else "frozen") for k in flat})
    tx = optax.multi_transform(
        {"lora": optax.adamw(args.lr), "frozen": optax.set_to_zero()},
        param_labels=labels)
    opt_state = tx.init(params)
    n_train = sum(v.size for k, v in flat.items() if lora_param_filter(k))
    print(f"trainable (LoRA/adapters): {n_train} params of "
          f"{sum(v.size for v in flat.values())}")

    def loss_fn(p):
        logits, _ = model.apply(
            {"params": p}, batch["mel"], batch["mel_lengths"],
            batch["prompt_tokens"], batch["target_tokens"], batch["wav"],
            batch["wav_lengths"], batch["left_tokens"],
            deterministic=False, method="forward_sft",
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        tgt = batch["target_tokens"]
        mask = (tgt != cfg.pad_id).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), tgt)
        return (ce * mask).sum() / mask.sum()

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        print(f"step {i}: loss {float(loss):.4f}")

    tokens = model.apply(
        {"params": params}, batch["mel"], batch["mel_lengths"],
        batch["prompt_tokens"], max_new=8, wav=batch["wav"],
        wav_lengths=batch["wav_lengths"], left_tokens=batch["left_tokens"],
        method="generate",
    )
    print("greedy tokens:", np.asarray(tokens)[0])


if __name__ == "__main__":
    main()
