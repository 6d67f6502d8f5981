"""Nibble-packed genome representation for gather-efficient window reads.

TPU gathers cost per *element*, not per byte — so the genome is packed
8 bases per uint32 word (4-bit nibble per base, values 0-6 preserving the
full SPEC.md §0 code alphabet incl. N/GAP/RPAD sentinels). A w-base
window then needs ceil(w/8)+1 word-gathers instead of w byte-gathers; the
per-row unpack is branchless VPU work (8 static shifts + an offset
select), no second gather. This one change cuts K1/K2's HBM gather count
~6-8x and is bit-exact: `gather_window` returns the same codes the byte
path would.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def pack_nibbles(codes: np.ndarray) -> np.ndarray:
    """Host-side: uint8 codes (values 0..6) -> uint32 words, 8 codes/word,
    base i in bits [4*(i%8), 4*(i%8)+3) of word i//8. Padding nibbles get
    the GAP-like value 7 (>=4 => mismatches everything, never canonical)."""
    codes = np.asarray(codes, dtype=np.uint8)
    n = codes.size
    pad = (-n) % 8
    c = np.concatenate([codes, np.full(pad, 7, np.uint8)]).astype(np.uint32)
    c = c.reshape(-1, 8)
    shifts = np.arange(8, dtype=np.uint32) * 4
    return np.bitwise_or.reduce(c << shifts, axis=1).astype(np.uint32)


def gather_window(packed: jnp.ndarray, starts: jnp.ndarray, width: int
                  ) -> jnp.ndarray:
    """codes[starts : starts+width] for each element of `starts` (uint32
    or int32, any shape S); returns int32 codes of shape S + (width,).

    `starts` must be pre-clamped to [0, n_bases - width]; the packed array
    must cover ceil((n_bases)/8)+width//8+1 words (pack_nibbles' padding
    plus genome sentinel padding guarantee this for all callers).
    """
    nwords = width // 8 + 2
    # Word indices fit int32 even for 4.29 Gbp genomes (< 2^29 words).
    word0 = (starts >> 3).astype(jnp.int32)
    off = (starts & 7).astype(jnp.int32)
    W = packed.shape[0]
    widx = jnp.clip(word0[..., None] + jnp.arange(nwords, dtype=jnp.int32),
                    0, W - 1)
    words = jnp.take(packed, widx, axis=0)              # [..., nwords]
    # Branchless unpack: [..., nwords, 8] -> [..., nwords*8].
    shifts = (jnp.arange(8, dtype=jnp.uint32) * 4)
    nibs = (words[..., None] >> shifts) & jnp.uint32(7)
    flat = nibs.reshape(*nibs.shape[:-2], nwords * 8).astype(jnp.int32)
    # Select among the 8 possible sub-word offsets with static slices.
    out = flat[..., 0:width]
    for o in range(1, 8):
        out = jnp.where((off == o)[..., None], flat[..., o:o + width], out)
    return out
