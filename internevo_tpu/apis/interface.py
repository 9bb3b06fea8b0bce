"""Interactive streaming generation (reference ``tools/interface.py``).

The reference exposes ``GenerationConfig`` + ``generate_interactive`` — a
token-by-token generator used by the chat surfaces (``web_demo.py``,
``tools/openai_api.py``) that yields the decoded response-so-far after every
step and stops on eos / ``additional_eos_token_id`` / max_length
(``tools/interface.py:14-137``).

TPU-native split of responsibilities: the THROUGHPUT path stays the fused
one-dispatch ``lax.while_loop`` (``apis/inference.SequenceGenerator``);
streaming runs one jitted decode step per token — latency-bound anyway, and
each intermediate token must reach the host to be yielded.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

from .inference import SequenceGenerator, init_kv_cache, top_k_top_p_filtering


@dataclass
class GenerationConfig:
    """Reference ``tools/interface.py:14-20`` knobs, same defaults."""

    max_length: int = 64
    top_p: float = 0.8
    temperature: float = 0.8
    do_sample: bool = True
    repetition_penalty: float = 1.0
    top_k: int = 0


def generate_interactive(
    generator: SequenceGenerator,
    prompt_ids,
    generation_config: Optional[GenerationConfig] = None,
    additional_eos_token_id: Optional[int] = None,
    seed: int = 0,
) -> Iterator[list]:
    """Yield the generated token-id list (response so far, eos trimmed) after
    every decode step.  ``prompt_ids``: 1D list/array of prompt token ids.
    Text decoding is the caller's tokenizer's job (the reference yields
    decoded text because it closes over an HF tokenizer; the chat surfaces
    here decode at the yield site).
    """
    gc = generation_config or GenerationConfig()
    eos_ids = {generator.eos_token_id} | set(generator.additional_eos)
    if additional_eos_token_id is not None:
        eos_ids.add(int(additional_eos_token_id))

    tokens = jnp.asarray(prompt_ids, jnp.int32).reshape(1, -1)
    prompt_len = tokens.shape[1]
    max_total = max(gc.max_length, prompt_len + 1)

    kv = init_kv_cache(generator.cfg, 1, max_total)
    logits, kv = generator._decode_jit(generator.params, tokens, kv, jnp.zeros((), jnp.int32))
    next_logits = logits[:, -1, :].astype(jnp.float32)

    seen = jnp.zeros((1, next_logits.shape[-1]), bool)
    seen = seen.at[0, tokens[0]].set(True)
    rng = jax.random.PRNGKey(seed)
    out_ids: list = []

    for step in range(max_total - prompt_len):
        lg = next_logits
        if gc.repetition_penalty != 1.0:
            # reference inference.py repetition-penalty semantics: scored
            # tokens already seen are divided (positive) / multiplied
            # (negative) by the penalty
            pen = jnp.where(lg > 0, lg / gc.repetition_penalty, lg * gc.repetition_penalty)
            lg = jnp.where(seen, pen, lg)
        if gc.do_sample:
            lg = lg / max(gc.temperature, 1e-6)
            lg = top_k_top_p_filtering(lg, top_k=gc.top_k, top_p=gc.top_p)
            rng, sub = jax.random.split(rng)
            tok = jax.random.categorical(sub, lg, axis=-1)
        else:
            tok = jnp.argmax(lg, axis=-1)
        tok_i = int(tok[0])
        if tok_i in eos_ids:
            yield list(out_ids)
            return
        out_ids.append(tok_i)
        yield list(out_ids)
        idx = jnp.asarray(prompt_len + step, jnp.int32)
        seen = seen.at[0, tok_i].set(True)
        logits, kv = generator._decode_jit(
            generator.params, tok.reshape(1, 1).astype(jnp.int32), kv, idx)
        next_logits = logits[:, -1, :].astype(jnp.float32)
    yield list(out_ids)
