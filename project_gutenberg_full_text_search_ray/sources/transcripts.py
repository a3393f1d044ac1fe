"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

The north-rule input is a Parquet table of multi-turn conversation/agent
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.  This generator is
the sandbox stand-in for that corpus: seeded, wall-clock-free, Zipf-skewed
vocabulary (so hot-term skew is real at small scale), with fixed phrases
planted in known turns for phrase-query tests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 10_000
STOPWORDISH = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]
PHRASES = {
    17: "to be or not to be",
    23: "the quick brown fox jumps over the lazy dog",
    31: "ray data streaming execution",
}
ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
ROLE_P = np.array([0.45, 0.45, 0.02, 0.08])
TOOLS = np.array(["bash", "search", "browser", "editor"], dtype=object)
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00 UTC in microseconds


def _vocab() -> np.ndarray:
    words = list(STOPWORDISH) + [f"w{k:05d}" for k in range(VOCAB_SIZE - len(STOPWORDISH))]
    return np.array(words, dtype=object)


def gen_transcripts(
    n_convs: int,
    turns_per_conv: int = 10,
    seed: int = 42,
    zipf_s: float = 1.07,
    conv_offset: int = 0,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = 1.0 / ranks**zipf_s
    p /= p.sum()

    n_turns = n_convs * turns_per_conv
    conv_idx = np.repeat(np.arange(conv_offset, conv_offset + n_convs), turns_per_conv)
    turn_idx = np.tile(np.arange(turns_per_conv, dtype=np.int32), n_convs)
    lengths = rng.integers(5, 121, size=n_turns)
    total_tokens = int(lengths.sum())
    # inverse-CDF Zipf sampling + Arrow list-join: vectorized end to end so
    # million-turn fixtures generate in seconds
    cdf = np.cumsum(p)
    token_ids = np.searchsorted(cdf, rng.random(total_tokens), side="right")
    token_ids = np.minimum(token_ids, len(vocab) - 1)
    vocab_pa = pa.array(vocab.tolist(), type=pa.string())
    flat = vocab_pa.take(pa.array(token_ids))
    offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
    tok_lists = pa.ListArray.from_arrays(pa.array(offsets), flat)
    import pyarrow.compute as pc

    texts_pa = pc.binary_join(tok_lists, " ")
    texts = texts_pa.to_pylist()
    # plant fixed phrases into known turns (GLOBAL conv % key == 0, turn 0)
    for mod, phrase in PHRASES.items():
        first = ((conv_offset + mod - 1) // mod) * mod
        for ci in range(first, conv_offset + n_convs, mod):
            local = ci - conv_offset
            texts[local * turns_per_conv] = texts[local * turns_per_conv] + " " + phrase

    roles = rng.choice(ROLES, size=n_turns, p=ROLE_P)
    tool_choice = rng.choice(TOOLS, size=n_turns)
    tools = np.where(roles == "tool", tool_choice, None)
    ts = BASE_TS_US + (conv_idx.astype(np.int64) * 3_600 + turn_idx.astype(np.int64) * 60) * 1_000_000

    return pa.table(
        {
            "conv_id": pa.array([f"conv-{i:08d}" for i in conv_idx], type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles.tolist(), type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools.tolist(), type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def transcripts_parquet(
    n_convs: int,
    turns_per_conv: int = 10,
    seed: int = 42,
    cache_root: str = "/tmp/pgfts_fixtures",
    n_files: int | None = None,
) -> str:
    """Write (or reuse) the deterministic fixture as a DIRECTORY of parquet
    shards (the realistic input layout — a 100 TB corpus is many files, and a
    sharded read is what lets Ray Data parallelize the scan).  Returns the
    directory path.  Each shard is generated independently (per-shard seed,
    global conv ids) so generation itself could be distributed."""
    if n_files is None:
        n_files = max(1, min(32, n_convs // 500))
    os.makedirs(cache_root, exist_ok=True)
    path = os.path.join(cache_root, f"transcripts_v3_c{n_convs}_t{turns_per_conv}_s{seed}_f{n_files}")
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        tmp = f"{path}.tmp.{os.getpid()}"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        per = -(-n_convs // n_files)
        for k in range(n_files):
            lo = k * per
            hi = min(lo + per, n_convs)
            if lo >= hi:
                break
            t = gen_transcripts(hi - lo, turns_per_conv, seed=seed * 1000 + k, conv_offset=lo)
            pq.write_table(t, os.path.join(tmp, f"part-{k:05d}.parquet"), row_group_size=4096)
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write("ok")
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
    return path
