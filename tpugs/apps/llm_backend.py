"""Real LLM backends for the NL scene editor.

The reference drives the editor with Mistral-7B-Instruct through a
transformers text-generation pipeline (``viewer_with_llm.py:97-99``).
Here the same transformers path is wired behind the ``Assistant``'s
pluggable str -> str contract:

* :func:`make_hf_backend` — load any local causal-LM checkpoint
  directory (Mistral, Llama, GPT-2, ...) with transformers. This
  environment has no network access, so weights must be provided as
  files — the exact requirement the reference has for Mistral.
* :func:`make_tiny_random_backend` — a small randomly-initialized GPT-2
  with a BPE tokenizer trained on the fly; generates garbage but
  exercises the full transformers tokenize → generate → decode → JSON
  extraction → grammar-fallback path end to end, offline (used by
  tests and ``--llm tiny-random``).
* :func:`make_backend` — CLI spec dispatcher:
  ``"hf:<path>"`` | ``"tiny-random"`` | ``""`` (grammar only).
"""

from __future__ import annotations

from typing import Callable, Optional


def make_hf_backend(
    model_path: str,
    max_new_tokens: int = 64,
    device: str = "cpu",
) -> Callable[[str], str]:
    """transformers causal-LM backend from a LOCAL checkpoint directory
    (reference loads Mistral-7B the same way, ``viewer_with_llm.py:
    97-99``; greedy decoding since the output must be parseable JSON)."""
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_path, local_files_only=True)
    model = AutoModelForCausalLM.from_pretrained(
        model_path, local_files_only=True, torch_dtype=torch.float32
    ).to(device).eval()
    if tok.pad_token_id is None:
        tok.pad_token = tok.eos_token

    def llm(prompt: str) -> str:
        ids = tok(
            prompt, return_tensors="pt", truncation=True, max_length=2048
        ).input_ids.to(device)
        with torch.no_grad():
            out = model.generate(
                ids,
                max_new_tokens=max_new_tokens,
                do_sample=False,
                pad_token_id=tok.pad_token_id,
            )
        return tok.decode(out[0, ids.shape[1]:], skip_special_tokens=True)

    return llm


def make_tiny_random_backend(
    seed: int = 0, max_new_tokens: int = 24
) -> Callable[[str], str]:
    """A real transformers generate() loop on a tiny random GPT-2 with a
    freshly trained BPE tokenizer — no downloaded files needed."""
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import GPT2Config, GPT2LMHeadModel, PreTrainedTokenizerFast

    from tpugs.apps.viewer_llm import FEW_SHOT_PROMPT

    corpus = [
        FEW_SHOT_PROMPT,
        '{"command": "segment", "object": "table"}',
        '{"command": "change_view", "view": "top"}',
        '{"command": "change_color", "object": "vase", "color": "red"}',
        "show me the scene from above please segment delete recolor",
    ]
    raw = Tokenizer(models.BPE(unk_token="<unk>"))
    raw.pre_tokenizer = pre_tokenizers.ByteLevel()
    raw.train_from_iterator(
        corpus,
        trainers.BpeTrainer(
            vocab_size=384, special_tokens=["<unk>", "<pad>", "<eos>"]
        ),
    )
    tok = PreTrainedTokenizerFast(
        tokenizer_object=raw,
        unk_token="<unk>",
        pad_token="<pad>",
        eos_token="<eos>",
    )
    torch.manual_seed(seed)
    model = GPT2LMHeadModel(
        GPT2Config(
            vocab_size=max(tok.vocab_size, 384),
            n_positions=1024,
            n_embd=32,
            n_layer=2,
            n_head=2,
        )
    ).eval()

    def llm(prompt: str) -> str:
        ids = tok(
            prompt, return_tensors="pt", truncation=True, max_length=900
        ).input_ids
        with torch.no_grad():
            out = model.generate(
                ids,
                max_new_tokens=max_new_tokens,
                do_sample=False,
                pad_token_id=tok.pad_token_id,
            )
        return tok.decode(out[0, ids.shape[1]:], skip_special_tokens=True)

    return llm


def make_backend(spec: str) -> Optional[Callable[[str], str]]:
    """``"hf:<path>"`` -> local checkpoint; ``"tiny-random"`` -> random
    GPT-2 plumbing test; ``""``/``"none"`` -> None (grammar parser)."""
    if not spec or spec == "none":
        return None
    if spec == "tiny-random":
        return make_tiny_random_backend()
    if spec.startswith("hf:"):
        return make_hf_backend(spec[3:])
    raise ValueError(
        f"unknown llm backend {spec!r} (use 'hf:<path>', 'tiny-random', "
        "or 'none')"
    )
