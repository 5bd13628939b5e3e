"""Byte-pair-encoding tokenizer training — the missing piece between the
whitespace/regex token counters (``operators.textops``) and a real LLM
training pipeline, which budgets and packs by TOKENIZER tokens, not words.

Algorithm: classic BPE over a word-frequency table (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016):
words split into characters plus an end-of-word sentinel, then the most
frequent adjacent symbol pair is merged, ``num_merges`` times.

Spark-first split of the work (``queries.bpe_token_count``):
- the ONLY corpus-scale job is a word-frequency groupBy (map-side
  combinable, one exchange on the word) — identical cost to a word count;
- merge learning runs driver-side over the top-``max_vocab`` words (the
  standard frequency-floor truncation every production BPE trainer
  applies; the table is vocabulary-sized, control-plane by construction);
- tokenization is a broadcast of the learned merge ranks into an
  Arrow-batched pandas UDF — pure map, zero shuffle.

Determinism contract (SURVEY.md §5.2): every tie is specified — pair
selection breaks on (count desc, pair lexicographic), vocabulary
truncation on (count desc, word) — so training replays identically across
partitionings, runs, and engines.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

__all__ = ["learn_bpe", "encode_word", "END_OF_WORD"]

END_OF_WORD = "</w>"


def learn_bpe(
    word_counts: Iterable[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from a word-frequency table.

    Returns the merge list in application order.  Stops early when no
    adjacent pair occurs at least twice (merging singletons is pure
    vocabulary bloat).
    """
    words: list[tuple[list[str], int]] = [
        (list(w) + [END_OF_WORD], int(n)) for w, n in word_counts if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, n in words:
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for sym, _ in words:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word by applying merges in learned order (lowest rank
    first) — the standard greedy BPE encoder."""
    sym = list(word) + [END_OF_WORD]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym
