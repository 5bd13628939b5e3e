"""Incremental sequence packing over a document stream.

Continual-pretraining data prep: documents arrive in micro-batches and must
leave as fixed-length packed sequences without re-packing the corpus.  The
batch operator (``operators/packing.pack_chunk_text``) recuts the whole
stream every run; this stateful form carries each shard's partial tail
chunk across micro-batches and emits only COMPLETED chunks per batch —
O(batch) work, state bounded by ``n_shards x max_tokens`` tokens total.

Semantics contract: chunk boundaries depend on the shard's token-stream
ORDER.  The batch operator orders by ``doc_id``; the stream packs in
arrival order (within a batch: ``doc_id`` order).  When the source delivers
batches in ``doc_id`` order — the replay-determinism convention every
streaming differential here relies on — the two produce IDENTICAL chunks
(asserted in tests); under out-of-order arrival the stream is still a valid
packing, just a different document interleaving (same property as any
streaming ingestion).

Partial tails: the final in-progress chunk per shard stays in state until
future documents complete it.  ``flush_tail=True`` closes the tail at the
end of EVERY micro-batch — it is the final-drain mode: run it on the last
pass over the remaining corpus (one batch), mirroring how the batch
operator's final chunk per shard may be short.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.packing import _shard_col

__all__ = ["streaming_pack_chunks"]

PACK_OUTPUT_SCHEMA = "shard long, chunk_id long, chunk_text string, n_tokens long"
PACK_STATE_SCHEMA = "n_chunks long, leftover string"


def _make_update(max_tokens: int, flush_tail: bool = False):
    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (shard,) = key
        if state.exists:
            n_chunks, leftover = state.get
        else:
            n_chunks, leftover = 0, ""
        tokens: list[str] = leftover.split(" ") if leftover else []
        out_ids: list[int] = []
        out_text: list[str] = []
        # The state API clusters by key but splits a large group into
        # MULTIPLE Arrow batches (arrow.maxRecordsPerBatch) in unspecified
        # read order — sorting each pdf independently would interleave
        # doc_ids across batch seams.  Materialize the group's ledger, sort
        # ONCE: the memory is the micro-batch's shard slice, which the
        # state API holds anyway.
        batches = list(pdfs)
        group = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()
        if len(group):
            for text in group.sort_values("doc_id")["text"]:
                if not text:
                    continue
                tokens.extend(text.split(" "))
                while len(tokens) >= max_tokens:
                    out_ids.append(n_chunks)
                    out_text.append(" ".join(tokens[:max_tokens]))
                    tokens = tokens[max_tokens:]
                    n_chunks += 1
        if flush_tail and tokens:
            out_ids.append(n_chunks)
            out_text.append(" ".join(tokens))
            tokens = []
            n_chunks += 1
        state.update((n_chunks, " ".join(tokens)))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(out_ids),
                "chunk_id": out_ids,
                "chunk_text": out_text,
                "n_tokens": [len(t.split(" ")) for t in out_text],
            }
        )

    return update


def streaming_pack_chunks(
    docs: DataFrame,
    max_tokens: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    flush_tail: bool = False,
) -> DataFrame:
    """documents stream (doc_id, text) -> completed packed chunks per
    micro-batch.  Same md5 shard coin as the batch operators, so a corpus
    packed incrementally lands in the same shards as a batch re-pack.
    State per shard: (chunk counter, <max_tokens leftover tokens) — a few
    KB regardless of corpus size."""
    prepared = docs.select(
        _shard_col(id_col, n_shards).alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return prepared.groupBy("shard").applyInPandasWithState(
        _make_update(max_tokens, flush_tail=flush_tail),
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
