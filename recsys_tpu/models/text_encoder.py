"""Pluggable text encoder.

The reference hard-wires frozen ``bert-base-uncased``: word embeddings only
for RE fields and a full BERT forward for product names
(`item_tower.py:148-166`). Per SURVEY.md §7.2 the TPU build makes the text
encoder an interface with a small trainable default so the end-to-end slice
is self-contained (no HF downloads, no frozen 110M-param passenger): a
token-embedding table over the stateless hash vocab plus a small
transformer. A larger pretrained encoder can be dropped in behind the same
two methods without touching the towers.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from recsys_tpu.models.layers import TransformerEncoder, masked_mean


class HashTextEncoder(nn.Module):
    """Trainable default text encoder over hashed token ids."""

    vocab_size: int = 8192
    dim: int = 128
    num_layers: int = 2
    nhead: int = 4
    max_len: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.tok_emb = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype,
                                name="token_embedding")
        self.pos_emb = self.param("pos_embedding", nn.initializers.normal(0.02),
                                  (self.max_len, self.dim))
        self.encoder = TransformerEncoder(self.dim, self.nhead, self.num_layers,
                                          dtype=self.dtype)

    def embed_tokens(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Embedding-table-only path — the analogue of the reference's frozen
        BERT *word embeddings* branch for RE fields (`item_tower.py:248-249`),
        except trainable. (..., T) -> (..., T, dim)."""
        return self.tok_emb(ids)

    def encode(self, ids: jnp.ndarray, mask: jnp.ndarray,
               deterministic: bool = True) -> jnp.ndarray:
        """Full contextual encoding + masked mean pool — the analogue of the
        full-BERT-forward [CLS] branch for names (`item_tower.py:270-272`).
        (B, T) -> (B, dim)."""
        x = self.tok_emb(ids) + self.pos_emb[None, : ids.shape[1]].astype(self.dtype)
        x = self.encoder(x, pad_mask=mask, deterministic=deterministic)
        return masked_mean(x, mask)
