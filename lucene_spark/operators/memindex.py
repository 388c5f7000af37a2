"""MemoryIndex — the reference's single-document in-memory index as a
standalone API (``lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java``: addField / search / freeze / reset).

The reference builds an ephemeral one-document index and scores ANY
query against it — percolation, document classification, highlighting
of retrieved texts. This port layers the role on the same
float32-exact scoring chain the engine and the OracleIndex share, so a
``MemoryIndex(text).search(q)`` score is bit-identical to indexing the
one document and searching it (asserted by tests):

* collection statistics come from the single document, exactly like
  the reference (docCount = 1, sumTotalTermFreq = the doc's length) —
  a term's idf is idf(df=1, N=1);
* every query family the engine supports works (the dispatch is the
  OracleIndex's, which is parity-locked to the Spark engine);
* ``freeze()`` makes the instance immutable (the reference's frozen
  mode rejects further addField); ``reset()`` clears it for reuse.

Single analyzed text field, like the rest of the engine (the query
model is field-less — documented scope). The analyzer chain accepts
the same knobs as ``OracleIndex.build`` / ``build_index``.
"""

from __future__ import annotations

from ..oracle import OracleIndex
from ..plans.query import Query


class MemoryIndex:
    """One-document in-memory index (MemoryIndex.java role)."""

    def __init__(self, text: str | None = None, **analyzer_kwargs):
        self._kwargs = analyzer_kwargs
        self._idx: OracleIndex | None = None
        self._frozen = False
        if text is not None:
            self.add_field(text)

    def add_field(self, text: str) -> "MemoryIndex":
        """Set the document's analyzed text (MemoryIndex.addField).
        Like the reference, adding to a frozen index raises."""
        if self._frozen:
            raise ValueError("cannot add fields to a frozen MemoryIndex")
        if self._idx is not None:
            raise ValueError("MemoryIndex holds exactly one document "
                             "field; reset() first")
        self._idx = OracleIndex.build([(0, text)], **self._kwargs)
        return self

    def freeze(self) -> "MemoryIndex":
        """MemoryIndex.freeze(): no further mutation."""
        self._frozen = True
        return self

    def reset(self) -> None:
        """MemoryIndex.reset(): clear for reuse (frozen or not —
        matches the reference, whose reset() unfreezes)."""
        self._idx = None
        self._frozen = False

    def search(self, query: Query, k1: float = 1.2, b: float = 0.75,
               similarity=None) -> float:
        """Score of the single document (0.0 when it does not match) —
        MemoryIndex.search(Query). Float32-exact vs indexing the doc
        and searching."""
        if self._idx is None:
            return 0.0
        if similarity is not None:
            scores = self._idx.score(query, k1=k1, b=b, sim=similarity)
        else:
            scores = self._idx.score(query, k1=k1, b=b)
        return float(scores.get(0, 0.0))
