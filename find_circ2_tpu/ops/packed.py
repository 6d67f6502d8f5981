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
    the GAP-like value 7 (>=4 => mismatches everything, never canonical).

    The word count is padded to a multiple of 8 (plus one spare row) so
    `gather_window` can view the array as [W/8, 8] 32-byte rows and pull
    whole rows per gather."""
    codes = np.asarray(codes, dtype=np.uint8)
    n = codes.size
    pad = (-n) % 8
    c = np.concatenate([codes, np.full(pad, 7, np.uint8)]).astype(np.uint32)
    c = c.reshape(-1, 8)
    shifts = np.arange(8, dtype=np.uint32) * 4
    words = np.bitwise_or.reduce(c << shifts, axis=1).astype(np.uint32)
    wpad = (-words.size) % 8 + 8
    return np.concatenate(
        [words, np.full(wpad, 0x77777777, np.uint32)])


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
    # Row-granular fetch: the packed genome viewed as [W/8, 8] 32-byte
    # rows (pack_nibbles pads W to a multiple of 8 + 1 spare row), so a
    # window costs ceil(nwords/8)+1 row gathers instead of nwords
    # single-word gathers — TPU gathers are issue-rate-bound per ROW
    # (docs/DESIGN.md "Pallas K1 verdict"), so ~5x fewer gather rows for
    # the same bytes.
    W8 = packed.shape[0] // 8
    packed8 = packed[:W8 * 8].reshape(W8, 8)
    nrows = (nwords + 7) // 8 + 1
    row0 = word0 >> 3
    woff = word0 & 7
    ridx = jnp.clip(row0[..., None] + jnp.arange(nrows, dtype=jnp.int32),
                    0, W8 - 1)
    rows = jnp.take(packed8, ridx, axis=0)              # [..., nrows, 8]
    flatw = rows.reshape(*rows.shape[:-2], nrows * 8)
    # Select the nwords-word window at the sub-row offset (static slices).
    words = flatw[..., 0:nwords]
    for o in range(1, 8):
        words = jnp.where((woff == o)[..., None],
                          flatw[..., o:o + nwords], words)
    # Branchless unpack: [..., nwords, 8] -> [..., nwords*8].
    shifts = (jnp.arange(8, dtype=jnp.uint32) * 4)
    nibs = (words[..., None] >> shifts) & jnp.uint32(7)
    flat = nibs.reshape(*nibs.shape[:-2], nwords * 8).astype(jnp.int32)
    # Select among the 8 possible sub-word offsets with static slices.
    out = flat[..., 0:width]
    for o in range(1, 8):
        out = jnp.where((off == o)[..., None], flat[..., o:o + width], out)
    return out
