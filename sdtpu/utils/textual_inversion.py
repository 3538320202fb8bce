"""Textual-inversion embeddings: new concept tokens as learned rows of the
CLIP token-embedding table.

Beyond-reference capability (companion to ``sdtpu/utils/lora.py``): a
textual-inversion file carries one or more learned embedding vectors for a
placeholder token (``<cat-toy>``).  Loading appends the vectors as new rows
of ``params["clip"]["token_embedding"]["weight"]`` and registers the
placeholder with the tokenizer so prompts can use it directly.  TPU-first:
the embedding lookup is a ``jnp.take`` (``ops/embedding.py``), so a grown
table is just a new array shape — the encode program retraces once and
every compiled executable keeps working.

Supported file layouts (auto-detected):

* **diffusers** ``learned_embeds.safetensors`` — ``{token: (n, hidden)}``
  (the key IS the placeholder string).
* **sd-scripts / A1111 safetensors** — ``{"emb_params": (n, hidden)}``
  (placeholder supplied by the caller via ``token=``).
* **SDXL dual-encoder** — ``{"clip_l": (n, 768), "clip_g": (n, 1280)}``
  (both tables grow; ids are shared because SD tokenizes both encoders
  with the same ids).
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

import numpy as np


def _rows(emb) -> np.ndarray:
    a = np.asarray(emb, np.float32)
    if a.ndim == 1:
        a = a[None, :]
    if a.ndim != 2:
        raise ValueError(f"embedding must be (n, hidden), got {a.shape}")
    return a


def _append_rows(clip_params: dict, rows: np.ndarray) -> int:
    table = np.asarray(clip_params["token_embedding"]["weight"])
    if rows.shape[1] != table.shape[1]:
        raise ValueError(
            f"embedding dim {rows.shape[1]} != encoder dim {table.shape[1]}"
        )
    first_id = table.shape[0]
    clip_params["token_embedding"]["weight"] = np.concatenate(
        [table, rows.astype(table.dtype)], axis=0
    )
    return first_id


def parse_textual_inversion(
    sd: Mapping, *, token: Optional[str] = None
) -> list:
    """Normalize a textual-inversion state dict to
    ``[(placeholder, clip_l_rows, clip_g_rows_or_None), ...]``."""
    keys = set(sd.keys())
    if keys == {"clip_l", "clip_g"}:
        if token is None:
            raise ValueError(
                "dual-encoder textual inversion needs token=\"<name>\""
            )
        return [(token, _rows(sd["clip_l"]), _rows(sd["clip_g"]))]
    if "emb_params" in keys:
        if token is None:
            raise ValueError(
                "emb_params-layout textual inversion needs token=\"<name>\""
            )
        return [(token, _rows(sd["emb_params"]), None)]
    out = []
    for k, v in sd.items():
        if k.startswith("string_to_"):  # A1111 .pt metadata keys
            continue
        out.append((token or k, _rows(v), None))
    if not out:
        raise ValueError(f"no embeddings found (keys: {sorted(keys)})")
    return out


def apply_textual_inversion(
    params: dict,
    sd: Mapping,
    *,
    token: Optional[str] = None,
) -> Tuple[dict, dict]:
    """Append the file's embedding vectors to the CLIP table(s).

    Returns ``(new_params, {placeholder: [new token ids]})`` — the ids are
    what a ``token_ids``-level caller substitutes for the placeholder; the
    pipeline also registers them with its tokenizer.  The input tree is
    not modified (containers copied, leaves shared except the grown
    tables)."""
    from sdtpu.utils.lora import _copy_containers

    new = _copy_containers(params)
    registered: dict = {}
    for placeholder, rows_l, rows_g in parse_textual_inversion(
            sd, token=token):
        if "clip" not in new:
            # bigG-only pipeline (SDXL refiner): the single table IS
            # clip_2 — dual-encoder files contribute their G rows only
            rows = rows_g if rows_g is not None else rows_l
            first = _append_rows(new["clip_2"], rows)
            registered[placeholder] = list(
                range(first, first + rows.shape[0])
            )
            continue
        first = _append_rows(new["clip"], rows_l)
        ids = list(range(first, first + rows_l.shape[0]))
        if rows_g is not None:
            if "clip_2" not in new:
                raise ValueError(
                    "dual-encoder embedding but the pipeline has one "
                    "text encoder"
                )
            first_g = _append_rows(new["clip_2"], rows_g)
            if first_g != first:
                raise ValueError(
                    "clip_l/clip_g tables out of sync: new ids "
                    f"{first} vs {first_g} (load the same inversions in "
                    "the same order for both encoders)"
                )
        elif "clip_2" in new:
            raise ValueError(
                "single-encoder embedding on a dual-encoder (SDXL) "
                "pipeline — provide {clip_l, clip_g}"
            )
        registered[placeholder] = ids
    return new, registered
