"""Distributed segment build: the index write path.

Spark shape (SURVEY.md §3.1): one shuffle partitions documents into
segments (the reference's DWPT model — each task owns a private segment,
no locks: ``index/DocumentsWriter.java:60-66``), then a vectorized
``applyInPandas`` kernel per segment performs the whole
tokenize → invert → delta/FOR/VByte-encode chain
(``index/IndexingChain.java:577-1309`` + ``codecs/lucene90/
Lucene90PostingsWriter.java:219-427``) and flushes an immutable segment
directory. The driver then atomically commits a snapshot listing every
segment with its lineage metrics (``index/IndexWriter.java:3849``).

Scale design notes (100 TB / 1000 executors):
  * exactly ONE wide shuffle of the raw documents (by segment key); all
    per-token work happens map-side inside the segment kernel — the
    token-level explode/groupBy never hits the shuffle, so near-universal
    terms (``if``, ``return``) cannot create reducer skew here.
  * ``sha2(content)`` and the segment key are computed JVM-side before the
    shuffle (whole-stage codegen), not in Python.
  * segment count is a knob: size segments so one fits executor memory
    (reference slices ~250k docs: ``search/IndexSearcher.java:95-97``).
  * resume: segment directories are durable units with atomic renames; a
    re-run anti-joins away already-built segments BEFORE the shuffle, so
    resuming a 95%-complete build shuffles only the missing 5%.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pandas as pd

from ..functions.analysis import analyze_batch
from ..functions.codec import encode_postings_batch
from ..functions.smallfloat import int_to_byte4
from ..sources.catalog import SnapshotCatalog

SEG_COL = "__seg__"
SHA_COL = "sha256"

STATS_SCHEMA = ("seg_id int, num_docs long, num_terms long, num_postings long, "
                "sum_doc_len long, sum_token_len long, "
                "bytes_compressed long, build_partition int, "
                "status string")

POSTINGS_COLUMNS = ["term", "seg_id", "df", "ttf", "doc_bytes", "tf_bytes",
                    "pos_bytes", "block_last", "impact_bytes"]


def invert_segment(pdf: pd.DataFrame, seg_id: int, content_col: str,
                   doc_id_col: str, stopwords: frozenset,
                   store_positions: bool,
                   stemmer: str | None = None,
                   synonyms: dict | None = None,
                   discount_overlaps: bool = True,
                   sort_field: str | None = None,
                   sort_ascending: bool = True,
                   payload_delimiter: str | None = None,
                   tokenizer: str = "standard",
                   shingles: tuple | None = None,
                   ascii_folding: bool = False,
                   common_grams: frozenset | None = None,
                   elision: frozenset | None = None,
                   cjk_bigrams: int | None = None,
                   cjk_output_unigrams: bool = False,
                   ngrams: tuple | None = None,
                   ngram_edge: bool = False,
                   ngram_preserve_original: bool = False,
                   word_delimiter: int | None = None,
                   word_delimiter_protected: frozenset = frozenset(),
                   keyword_repeat: bool = False,
                   pattern_replace: tuple | None = None,
                   token_filters: tuple = (),
                   dictionary_compound=None,
                   capture_groups: tuple | None = None,
                   char_filters: tuple = (),
                   reverse_tokens: bool = False,
                   term_freq_delimiter: str | None = None,
                   keyword_marker: frozenset = frozenset(),
                   stemmer_override: dict | None = None,
                   phonetic: tuple | None = None,
                   hunspell: tuple | None = None,
                   min_hash: tuple | None = None,
                   concatenate_graph: bool | tuple = False,
                   icu_folding: bool | str = False
                   ) -> tuple[pd.DataFrame, pd.DataFrame, dict, int]:
    """Pure kernel: docs of one segment →
    (postings, doc_meta, norms_payload, sum_token_len).

    Local docIDs are assigned by ascending ``doc_id`` within the segment
    (deterministic stand-in for the reference's arrival order,
    ``index/IndexingChain.java:577``).

    ``synonyms`` enables index-time SynonymGraphFilter expansion
    (keepOrig single-token map, posIncrement=0 overlap tokens);
    ``discount_overlaps`` is BM25Similarity's default-true norm rule —
    overlap tokens are indexed (tf/df/ttf/positions) but subtracted from
    the norm length (``BM25Similarity.java:142-143``). sum_token_len
    counts EVERY indexed token (the sumTotalTermFreq basis), diverging
    from sum_doc_len exactly when overlaps are discounted.
    """
    if sort_field is not None:
        # IndexSorter (reference ``index/IndexSorter.java:44``): local doc
        # ids follow the sort key, so a sorted-field top-k reads only each
        # segment's physical prefix (early termination); global doc_id
        # remains the tie-break within equal keys
        pdf = pdf.sort_values([sort_field, doc_id_col],
                              ascending=[sort_ascending, True],
                              kind="mergesort").reset_index(drop=True)
    else:
        pdf = pdf.sort_values(doc_id_col,
                              kind="mergesort").reset_index(drop=True)
    # object-dtype null-fill: avoids the pandas StringDtype conversion
    # (a full validate+copy pass) — every consumer reads the values back
    # out as an object ndarray anyway
    texts = pdf[content_col].to_numpy(dtype=object, copy=True)
    texts[pd.isna(texts)] = ""
    if char_filters:
        # Analyzer.initReader: char filters rewrite the raw text BEFORE
        # the tokenizer (charfilter/HTMLStripCharFilter.java,
        # MappingCharFilter.java) — one pass per doc inside this batch
        from ..functions.charfilter import compile_char_filters
        _cf = compile_char_filters(char_filters)
        texts = np.array([_cf(s) for s in texts], dtype=object)
    texts = pd.Series(texts)
    n_docs = len(pdf)
    if cjk_bigrams is not None:
        # CJKAnalyzer chain (tokenize → width → lowercase → bigram →
        # stop); bigrams are position-dependent graph tokens, mutually
        # exclusive with every token-rewriting/expanding option
        if (stemmer or synonyms or shingles or common_grams
                or ascii_folding or icu_folding or elision or payload_delimiter
                or tokenizer != "standard"):
            raise ValueError("cjk_bigrams is mutually exclusive with "
                             "stemmer/synonyms/shingles/common_grams/"
                             "ascii_folding/elision/payloads and "
                             "non-standard tokenizers")
        from ..functions.cjk import cjk_analyze_batch
        doc_idx, terms, positions, lengths, cjk_over = cjk_analyze_batch(
            pd.Series(texts.to_numpy(dtype=object)), stopwords=stopwords,
            flags=cjk_bigrams, output_unigrams=cjk_output_unigrams)
    elif tokenizer in ("path", "path_reverse") or (
            isinstance(tokenizer, tuple)
            and tokenizer[0] not in ("pattern", "url_email")):
        # (Reverse)PathHierarchyTokenizer / raw (Edge)NGramTokenizer —
        # whole-input tokenizers that replace the analysis chain; the
        # stream-rewriting filters don't compose with them
        if (stemmer or synonyms or shingles or common_grams
                or ascii_folding or icu_folding or elision or payload_delimiter
                or stopwords or ngrams):
            raise ValueError("path/ngram tokenizers are mutually "
                             "exclusive with the token-filter chain "
                             "(stopwords/stemmer/synonyms/shingles/"
                             "common_grams/ascii_folding/elision/"
                             "payloads/ngrams)")
        from ..functions.ngram import (ngram_tokenize_batch,
                                       path_tokenize_batch)
        texts_ser = pd.Series(texts.to_numpy(dtype=object))
        if tokenizer in ("path", "path_reverse"):
            doc_idx, terms, positions, lengths, cjk_over = \
                path_tokenize_batch(texts_ser,
                                    reverse=(tokenizer == "path_reverse"))
        else:
            kind, mn, mx = tokenizer
            if kind not in ("ngram", "edge_ngram"):
                raise ValueError(f"unknown tokenizer {tokenizer!r}")
            doc_idx, terms, positions, lengths = ngram_tokenize_batch(
                texts_ser, mn, mx, edge=(kind == "edge_ngram"))
            cjk_over = np.zeros(n_docs, dtype=np.int64)
    elif word_delimiter is not None:
        # WordDelimiterGraphFilter chain (reference recommendation:
        # whitespace tokenize -> WDGF -> lowercase; case information
        # drives the splits, so LowerCaseFilter comes AFTER)
        if (stemmer or synonyms or shingles or common_grams
                or ascii_folding or icu_folding or elision or payload_delimiter
                or stopwords or ngrams is not None):
            raise ValueError("word_delimiter is mutually exclusive with "
                             "the other token filters")
        if tokenizer != "whitespace":
            raise ValueError("word_delimiter requires "
                             "tokenizer='whitespace' (the reference "
                             "pairs WDGF with a non-splitting tokenizer)")
        from ..functions.worddelim import expand_worddelim_batch
        doc_idx, terms, positions, lengths = analyze_batch(
            pd.Series(texts.to_numpy(dtype=object)),
            tokenizer="whitespace", lowercase=False)
        doc_idx, terms, positions, lengths, cjk_over = \
            expand_worddelim_batch(doc_idx, terms, positions, n_docs,
                                   word_delimiter,
                                   word_delimiter_protected)
        if len(terms):
            codes, uniq = pd.factorize(terms)
            terms = np.array([u.lower() for u in uniq],
                             dtype=object)[codes]
    elif capture_groups is not None:
        # PatternCaptureGroupTokenFilter chain (reference composition:
        # tokenize -> captures -> lowercase — case information drives
        # the camelCase patterns, so LowerCaseFilter comes AFTER)
        if (stemmer or synonyms or shingles or common_grams
                or ascii_folding or icu_folding or elision or payload_delimiter
                or stopwords or ngrams is not None or keyword_repeat):
            raise ValueError("capture_groups is mutually exclusive with "
                             "the other token filters")
        from ..functions.pattern import expand_capture_groups_batch
        patterns, preserve_original = capture_groups
        doc_idx, terms, positions, lengths = analyze_batch(
            pd.Series(texts.to_numpy(dtype=object)),
            tokenizer=tokenizer, lowercase=False)
        doc_idx, terms, positions, cjk_over = expand_capture_groups_batch(
            doc_idx, terms, positions, n_docs, patterns,
            preserve_original)
        if len(terms):
            codes, uniq = pd.factorize(terms)
            terms = np.array([u.lower() for u in uniq],
                             dtype=object)[codes]
    elif keyword_repeat:
        # KeywordRepeatFilter chain (lowercase → stop → KeywordRepeat →
        # stem → RemoveDuplicates): analyze WITHOUT the stemmer so the
        # original surface form survives, then add stemmed posInc-0
        # overlaps where stemming changed the token
        if stemmer is None:
            raise ValueError("keyword_repeat requires a stemmer")
        if (synonyms or shingles or common_grams or payload_delimiter
                or ngrams is not None):
            raise ValueError("keyword_repeat is mutually exclusive with "
                             "synonyms/shingles/common_grams/payloads/"
                             "ngrams")
        from ..functions.analysis import expand_keyword_repeat_batch
        doc_idx, terms, positions, lengths = analyze_batch(
            pd.Series(texts.to_numpy(dtype=object)),
            stopwords=stopwords,
            tokenizer=tokenizer,
            ascii_folding=ascii_folding,
            icu_folding=icu_folding,
            elision=elision,
            pattern_replace=pattern_replace,
            token_filters=token_filters)
        doc_idx, terms, positions, cjk_over = expand_keyword_repeat_batch(
            doc_idx, terms, positions, n_docs, stemmer)
    else:
        doc_idx, terms, positions, lengths = analyze_batch(
            pd.Series(texts.to_numpy(dtype=object)),
            stopwords=stopwords,
            stemmer=stemmer,
            tokenizer=tokenizer,
            ascii_folding=ascii_folding,
            icu_folding=icu_folding,
            elision=elision,
            pattern_replace=pattern_replace,
            token_filters=token_filters,
            keyword_marker=keyword_marker,
            stemmer_override=stemmer_override)
        cjk_over = np.zeros(n_docs, dtype=np.int64)
    if concatenate_graph:
        # ConcatenateGraphFilter (miscellaneous/ConcatenateGraphFilter
        # .java): the whole surviving stream becomes ONE token, tokens
        # joined by SEP_LABEL (U+001F) with one extra separator per
        # skipped position when preserve_position_increments (the
        # TokenStreamToAutomaton hole encoding) — the CompletionAnalyzer
        # key shape. concatenate_graph = True or (sep, preserve_posinc).
        sep, preserve_inc = ("\u001f", True)
        if isinstance(concatenate_graph, tuple):
            sep, preserve_inc = concatenate_graph
        if (synonyms or shingles or common_grams or payload_delimiter
                or dictionary_compound is not None or ngrams is not None
                or keyword_repeat or phonetic is not None
                or min_hash is not None):
            raise ValueError("concatenate_graph is mutually exclusive "
                             "with the other stream-rewriting filters")
        out_d, out_t = [], []
        lengths = np.zeros(n_docs, dtype=np.int64)
        if len(terms):
            order = np.lexsort((positions, doc_idx))
            d_s, t_s, p_s = (doc_idx[order], terms[order],
                             positions[order])
            bounds = np.concatenate(
                ([0], np.flatnonzero(np.diff(d_s)) + 1, [len(d_s)]))
            for a, b in zip(bounds[:-1], bounds[1:]):
                doc = int(d_s[a])
                parts = [t_s[a]]
                for j in range(a + 1, b):
                    gap = int(p_s[j] - p_s[j - 1]) if preserve_inc else 1
                    parts.append(sep * max(gap, 1))
                    parts.append(t_s[j])
                out_d.append(doc)
                out_t.append("".join(parts))
                lengths[doc] = 1
        doc_idx = np.array(out_d, dtype=np.int64)
        terms = np.array(out_t, dtype=object)
        positions = np.zeros(len(out_d), dtype=np.int64)
    if min_hash is not None:
        # MinHashFilter pipeline (analysis/minhash/MinHashFilter.java):
        # k-shingle the analyzed stream (ShingleFilter with
        # outputUnigrams=false, space separator), then collapse each doc
        # into its MinHash token set — all at position 0 (posInc 1 then
        # 0), so norms see length 1 and the overlays count only into
        # sumTotalTermFreq. min_hash = (k, hash_count, bucket_count,
        # hash_set_size, with_rotation).
        if (synonyms or shingles or common_grams or payload_delimiter
                or dictionary_compound is not None or ngrams is not None
                or keyword_repeat or phonetic is not None):
            raise ValueError("min_hash is mutually exclusive with the "
                             "other stream-rewriting filters")
        from ..functions.minhash import expand_minhash_batch
        k, hc, bc, hss, rot = min_hash
        doc_idx, terms, positions, lengths, mh_over = \
            expand_minhash_batch(doc_idx, terms, positions, n_docs,
                                 int(k), int(hc), int(bc), int(hss), rot)
        cjk_over = cjk_over + mh_over
    if phonetic is not None:
        # PhoneticFilter (reference ``analysis/phonetic/PhoneticFilter
        # .java``): phonetic = (encoder_name, inject). inject=True emits
        # the encoding as a posInc=0 overlay beside the original (norm
        # discount like every overlay); inject=False replaces the term.
        if (synonyms or shingles or common_grams or payload_delimiter
                or dictionary_compound is not None or ngrams is not None
                or keyword_repeat):
            raise ValueError("phonetic is mutually exclusive with the "
                             "graph-expanding filters")
        enc_name = phonetic[0]
        inject = phonetic[1] if len(phonetic) > 1 else True
        if enc_name == "double_metaphone_filter":
            # DoubleMetaphoneFilter.java: primary + distinct alternate
            # as overlay tokens; phonetic = (name, inject, maxCodeLen).
            from ..functions.phonetic import double_metaphone_batch
            mcl = int(phonetic[2]) if len(phonetic) > 2 else 4
            doc_idx, terms, positions, ph_over = double_metaphone_batch(
                doc_idx, terms, positions, n_docs, mcl, inject)
            cjk_over = cjk_over + ph_over
        elif enc_name == "beider_morse":
            # BeiderMorseFilter.java: the encoded form's ([^()|-]+)
            # groups replace the token (first at the source position,
            # rest posInc=0). phonetic = ("beider_morse", name_type,
            # rule_type, concat, languages|None).
            from ..functions.beidermorse import beider_morse_batch
            nt = phonetic[1] if len(phonetic) > 1 else "generic"
            rt = phonetic[2] if len(phonetic) > 2 else "approx"
            cc = phonetic[3] if len(phonetic) > 3 else True
            lg = phonetic[4] if len(phonetic) > 4 else None
            doc_idx, terms, positions, ph_over = beider_morse_batch(
                doc_idx, terms, positions, n_docs, nt, rt, cc, lg)
            cjk_over = cjk_over + ph_over
        elif enc_name == "daitch_mokotoff_filter":
            # DaitchMokotoffSoundexFilter.java: every '|' branch of the
            # branching encoder becomes an overlay token.
            from ..functions.phonetic import daitch_mokotoff_batch
            doc_idx, terms, positions, ph_over = daitch_mokotoff_batch(
                doc_idx, terms, positions, n_docs, inject)
            cjk_over = cjk_over + ph_over
        elif inject:
            from ..functions.phonetic import expand_phonetic_batch
            doc_idx, terms, positions, ph_over = expand_phonetic_batch(
                doc_idx, terms, positions, n_docs, enc_name)
            cjk_over = cjk_over + ph_over
        else:
            from ..functions.phonetic import replace_phonetic_batch
            terms = replace_phonetic_batch(terms, enc_name)
    if hunspell is not None:
        # HunspellStemFilter (reference ``analysis/hunspell/
        # HunspellStemFilter.java``): stems replace the token (first at
        # the source position, the rest posInc=0 overlays; stemless
        # tokens pass through). hunspell = (aff_path, dic_path[, dedup
        # [, longest_only[, ignore_case]]]) — the dictionary files must
        # be reachable from every executor (ship via --files at scale).
        if (synonyms or shingles or common_grams or payload_delimiter
                or dictionary_compound is not None or ngrams is not None
                or keyword_repeat or phonetic is not None):
            raise ValueError("hunspell is mutually exclusive with the "
                             "other graph-expanding filters")
        from ..functions.hunspell import hunspell_stem_batch
        aff_p, dic_p = hunspell[0], hunspell[1]
        dd = hunspell[2] if len(hunspell) > 2 else True
        lo = hunspell[3] if len(hunspell) > 3 else False
        ic = hunspell[4] if len(hunspell) > 4 else False
        doc_idx, terms, positions, hs_over = hunspell_stem_batch(
            doc_idx, terms, positions, n_docs, aff_p, dic_p,
            dedup=dd, longest_only=lo, ignore_case=ic)
        cjk_over = cjk_over + hs_over
    if term_freq_delimiter:
        # DelimitedTermFrequencyTokenFilter (reference ``analysis/common/
        # .../miscellaneous/DelimitedTermFrequencyTokenFilter.java``):
        # split each token at the LAST delimiter, the integer suffix is
        # the token's term frequency (default 1 without a delimiter).
        # The reference requires an index without positions
        # (IndexOptions.DOCS_AND_FREQS — the factory rejects more) and a
        # non-splitting tokenizer; the custom freq feeds BOTH the
        # postings tf and the field length the norm encodes
        # (FieldInvertState.length += termFrequency). Kernel shape:
        # repeat each token freq times — the run-length inversion then
        # produces exactly those tf/dl sums.
        if store_positions:
            raise ValueError("delimited term frequencies require "
                             "store_positions=False (reference: "
                             "IndexOptions.DOCS_AND_FREQS only)")
        if synonyms or shingles or common_grams or payload_delimiter \
                or dictionary_compound is not None or ngrams is not None:
            raise ValueError("term_freq_delimiter is mutually exclusive "
                             "with synonyms/shingles/common_grams/"
                             "payloads/compound/ngrams")
        if len(terms):
            ser = pd.Series(terms)
            parts = ser.str.rpartition(term_freq_delimiter)
            has = (parts[1] == term_freq_delimiter).to_numpy()
            vals = pd.to_numeric(parts[2], errors="coerce").to_numpy()
            bad = has & (~np.isfinite(vals) | (vals < 0)
                         | (vals != np.floor(vals)))
            if bad.any():
                # the reference's NumberFormatException surface
                raise ValueError("invalid term frequency suffix: "
                                 f"{terms[bad][:3].tolist()}")
            freqs = np.ones(len(terms), dtype=np.int64)
            freqs[has] = vals[has].astype(np.int64)
            terms = np.where(has, parts[0].to_numpy(dtype=object), terms)
            doc_idx = np.repeat(doc_idx, freqs)
            terms = np.repeat(terms, freqs)
            positions = np.repeat(positions, freqs)
            lengths = np.bincount(doc_idx, minlength=n_docs) \
                .astype(np.int64)
    if reverse_tokens and len(terms):
        # ReverseStringFilter (reference ``analysis/common/.../reverse/
        # ReverseStringFilter.java``): reverse every final token. With a
        # reversed dictionary a leading wildcard (*suffix) becomes a
        # PREFIX query — range-bucket-prunable against term_stats instead
        # of a full dictionary scan (the Solr ReversedWildcardFilter
        # deployment pattern: a parallel reversed field). Python reverses
        # code points, which equals the reference's surrogate-aware
        # UTF-16 reverse. Vocabulary-level: each unique token reversed
        # once.
        if payload_delimiter:
            raise ValueError("reverse_tokens is mutually exclusive with "
                             "payloads (the delimiter suffix would be "
                             "reversed away)")
        codes, uniq = pd.factorize(terms)
        terms = np.array([u[::-1] for u in uniq], dtype=object)[codes]
    payloads = None
    if payload_delimiter:
        # DelimitedPayloadTokenFilter + FloatEncoder (reference
        # ``analysis/common/.../payloads/DelimitedPayloadTokenFilter
        # .java``): split each token at the LAST delimiter; the suffix
        # parses as a float32 payload, the prefix is the term. Tokens
        # without a delimiter carry payload 0.0 (documented: the
        # reference leaves the payload absent; 0.0 is the identity for
        # the sum/avg functions we score with). Pair with the
        # whitespace tokenizer like the reference does — Standard
        # tokenization would split at the delimiter.
        if synonyms:
            raise ValueError("payloads and index-time synonyms are "
                             "mutually exclusive")
        ser = pd.Series(terms)
        parts = ser.str.rpartition(payload_delimiter)
        has = (parts[1] == payload_delimiter).to_numpy()
        stripped = parts[0].to_numpy(dtype=object)
        terms = np.where(has, stripped, terms)
        payloads = np.zeros(len(terms), dtype=np.float32)
        vals = pd.to_numeric(parts[2], errors="coerce") \
            .fillna(0.0).to_numpy()
        payloads[has] = vals[has].astype(np.float32)
    if synonyms:
        from ..functions.analysis import expand_synonyms_batch
        doc_idx, terms, positions, overlaps = expand_synonyms_batch(
            doc_idx, terms, positions, n_docs, synonyms)
    else:
        overlaps = np.zeros(n_docs, dtype=np.int64)
    if shingles:
        # index-time ShingleFilter (outputUnigrams=true): shingle tokens
        # are posInc=0 overlaps at the first component's position —
        # mutually exclusive with synonyms (graph streams) and payloads
        # (parallel array alignment)
        if synonyms or payload_delimiter:
            raise ValueError("shingles are mutually exclusive with "
                             "synonyms and payloads")
        from ..functions.analysis import expand_shingles_batch
        mn, mx = shingles
        doc_idx, terms, positions, sh_over = expand_shingles_batch(
            doc_idx, terms, positions, n_docs, mn, mx)
        overlaps = overlaps + sh_over
    if common_grams:
        # CommonGramsFilter: like shingles but only around common words,
        # '_' separator; same mutual-exclusion rules
        if synonyms or payload_delimiter or shingles:
            raise ValueError("common_grams is mutually exclusive with "
                             "synonyms, payloads and shingles")
        from ..functions.analysis import expand_common_grams_batch
        doc_idx, terms, positions, cg_over = expand_common_grams_batch(
            doc_idx, terms, positions, n_docs, common_grams)
        overlaps = overlaps + cg_over
    if dictionary_compound is not None:
        # DictionaryCompoundWordTokenFilter (compound/
        # DictionaryCompoundWordTokenFilter.java): subword overlays at
        # the source position — same graph shape as synonyms/shingles,
        # same mutual-exclusion rules (parallel array alignment)
        if synonyms or payload_delimiter or shingles or common_grams:
            raise ValueError("dictionary_compound is mutually exclusive "
                             "with synonyms, payloads, shingles and "
                             "common_grams")
        from ..functions.compound import expand_compound_batch
        doc_idx, terms, positions, dc_over = expand_compound_batch(
            doc_idx, terms, positions, n_docs, dictionary_compound)
        overlaps = overlaps + dc_over
    if ngrams is not None:
        # (Edge)NGramTokenFilter last in the chain (the reference's
        # usual composition); replaces per-doc lengths with emitting-
        # token counts (= posInc>0 tokens, the discountOverlaps norm)
        if synonyms or payload_delimiter or shingles or common_grams:
            raise ValueError("the ngrams filter is mutually exclusive "
                             "with synonyms, payloads, shingles and "
                             "common_grams")
        from ..functions.ngram import expand_ngrams_batch
        mn, mx = ngrams
        doc_idx, terms, positions, lengths, ng_over = expand_ngrams_batch(
            doc_idx, terms, positions, n_docs, mn, mx,
            preserve_original=ngram_preserve_original, edge=ngram_edge)
        overlaps = overlaps + ng_over
    overlaps = overlaps + cjk_over
    total_lengths = lengths + overlaps
    norm_lengths = lengths if discount_overlaps else total_lengths
    sum_token_len = int(total_lengths.sum())
    norm_bytes = int_to_byte4(norm_lengths)

    if len(terms):
        # term order = sorted unicode order (FreqProxTermsWriter.flush sorts
        # terms before the codec sees them: index/FreqProxTermsWriter.java:83)
        codes, uniques = pd.factorize(terms, sort=True)
        order = np.lexsort((positions, doc_idx, codes))
        c, d, p = codes[order], doc_idx[order], positions[order]
        # posting boundaries: change of (term, doc)
        new_post = np.empty(len(c), dtype=bool)
        new_post[0] = True
        new_post[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
        post_starts = np.nonzero(new_post)[0]
        post_ends = np.concatenate((post_starts[1:], [len(c)]))
        tfs_all = (post_ends - post_starts).astype(np.int64)
        post_docs = d[post_starts]
        post_codes = c[post_starts]
        # term boundaries over postings
        new_term = np.empty(len(post_codes), dtype=bool)
        new_term[0] = True
        new_term[1:] = post_codes[1:] != post_codes[:-1]
        term_starts = np.nonzero(new_term)[0]
        term_off = np.concatenate((term_starts, [len(post_codes)]))
        enc = encode_postings_batch(post_docs, tfs_all,
                                    p if store_positions else None,
                                    norm_bytes, term_off)
        if payloads is not None:
            # payload stream parallel to the position stream: raw
            # float32 per position, doc-major, sliced per term (parquet
            # page compression handles the bytes; FloatEncoder payloads
            # are uncompressed 4-byte values in the reference too)
            pay_sorted = payloads[order]
            tok_bounds = np.concatenate(([0], np.cumsum(tfs_all)))
            tok_off = tok_bounds[term_off]
            pay_bytes = [pay_sorted[tok_off[i]:tok_off[i + 1]]
                         .astype("<f4").tobytes()
                         for i in range(len(term_off) - 1)]
        postings = pd.DataFrame({
            "term": uniques[post_codes[term_starts]],
            "seg_id": np.int32(seg_id),
            "df": enc["df"].astype(np.int64),
            "ttf": enc["ttf"].astype(np.int64),
            "doc_bytes": enc["doc_bytes"],
            "tf_bytes": enc["tf_bytes"],
            "pos_bytes": enc["pos_bytes"],
            "block_last": enc["block_last"],
            "impact_bytes": enc["impact_bytes"],
        }, columns=POSTINGS_COLUMNS)
        if payloads is not None:
            postings["pay_bytes"] = pay_bytes
    else:
        cols = POSTINGS_COLUMNS + (["pay_bytes"]
                                   if payloads is not None else [])
        postings = pd.DataFrame(columns=cols)

    doc_meta = pdf.drop(columns=[content_col, SEG_COL], errors="ignore").copy()
    doc_meta.insert(0, "seg_id", np.int32(seg_id))
    doc_meta.insert(1, "local_doc_id", np.arange(n_docs, dtype=np.int32))
    doc_meta["doc_len"] = norm_lengths
    doc_meta["norm_byte"] = norm_bytes.astype(np.int32)

    norms_payload = {
        "seg_id": seg_id,
        "num_docs": n_docs,
        "norm_bytes": norm_bytes.tobytes(),
        "global_doc_ids": pdf[doc_id_col].to_numpy(dtype="<i8").tobytes(),
    }
    return postings, doc_meta, norms_payload, sum_token_len


def _write_segment(catalog_root: str, seg_id: int, postings: pd.DataFrame,
                   doc_meta: pd.DataFrame, norms_payload: dict,
                   build_partition: int, origin: str = "build",
                   sum_token_len: int | None = None) -> dict:
    """Flush one immutable segment dir atomically (tmp + rename)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fields = [
        ("term", pa.string()), ("seg_id", pa.int32()), ("df", pa.int32()),
        ("ttf", pa.int64()), ("doc_bytes", pa.binary()), ("tf_bytes", pa.binary()),
        ("pos_bytes", pa.binary()), ("block_last", pa.binary()),
        ("impact_bytes", pa.binary()),
    ]
    if "pay_bytes" in postings.columns:
        fields.append(("pay_bytes", pa.binary()))
    postings_schema = pa.schema(fields)

    seg_dir = os.path.join(catalog_root, "segments", f"seg={seg_id}")
    if os.path.exists(os.path.join(seg_dir, "stats.json")):
        with open(os.path.join(seg_dir, "stats.json")) as f:
            stats = json.load(f)
        stats["status"] = "reused"
        return stats

    tmp = os.path.join(catalog_root, "segments", f"_tmp-{seg_id}-{uuid.uuid4().hex}")
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(postings, schema=postings_schema,
                                        preserve_index=False),
                   os.path.join(tmp, "postings.parquet"))
    pq.write_table(pa.Table.from_pandas(doc_meta, preserve_index=False),
                   os.path.join(tmp, "doc_meta.parquet"))
    norms_tbl = pa.table({
        "seg_id": pa.array([norms_payload["seg_id"]], pa.int32()),
        "num_docs": pa.array([norms_payload["num_docs"]], pa.int64()),
        "norm_bytes": pa.array([norms_payload["norm_bytes"]], pa.binary()),
        "global_doc_ids": pa.array([norms_payload["global_doc_ids"]], pa.binary()),
    })
    pq.write_table(norms_tbl, os.path.join(tmp, "norms.parquet"))

    bytes_compressed = int(sum(
        postings[c].str.len().sum() for c in
        ("doc_bytes", "tf_bytes", "pos_bytes", "block_last", "impact_bytes")
    )) if len(postings) else 0
    stats = {
        "seg_id": int(seg_id),
        "num_docs": int(norms_payload["num_docs"]),
        "num_terms": int(len(postings)),
        "num_postings": int(postings["df"].sum()) if len(postings) else 0,
        "sum_doc_len": int(doc_meta["doc_len"].sum()) if len(doc_meta) else 0,
        "sum_token_len": int(sum_token_len) if sum_token_len is not None
        else (int(doc_meta["doc_len"].sum()) if len(doc_meta) else 0),
        "bytes_compressed": bytes_compressed,
        "build_partition": int(build_partition),
        "origin": origin,
        "status": "built",
    }
    with open(os.path.join(tmp, "stats.json"), "w") as f:
        json.dump(stats, f)
    try:
        os.rename(tmp, seg_dir)
    except OSError:
        # concurrent/previous writer won the rename; reuse theirs
        shutil.rmtree(tmp, ignore_errors=True)
        with open(os.path.join(seg_dir, "stats.json")) as f:
            stats = json.load(f)
        stats["status"] = "reused"
    return stats


def _write_term_vectors(catalog_root: str, seg_id: int, pdf: pd.DataFrame,
                        content_col: str, doc_id_col: str,
                        stopwords: frozenset) -> None:
    """Per-doc analyzed (terms, starts, ends) offset sidecar, one parquet
    file per build segment under <index>/term_vectors/, keyed by GLOBAL
    doc_id (seg_id kept so readers can latest-win across updateDocument
    generations). Executor-written, atomic rename; idempotent on resume
    (segment status 'built' gates the write)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.analysis import analyze_text_offsets

    tv_dir = os.path.join(catalog_root, "term_vectors")
    os.makedirs(tv_dir, exist_ok=True)
    final = os.path.join(tv_dir, f"seg-{seg_id}.parquet")
    if os.path.exists(final):
        return
    rows_t, rows_s, rows_e = [], [], []
    for text in pdf[content_col]:
        t, s, e = analyze_text_offsets(text or "", stopwords=stopwords)
        rows_t.append(t)
        rows_s.append(s)
        rows_e.append(e)
    tbl = pa.table({
        "doc_id": pa.array(pdf[doc_id_col].astype("int64"), pa.int64()),
        "seg_id": pa.array(np.full(len(pdf), seg_id, np.int32), pa.int32()),
        "terms": pa.array(rows_t, pa.list_(pa.string())),
        "starts": pa.array(rows_s, pa.list_(pa.int32())),
        "ends": pa.array(rows_e, pa.list_(pa.int32())),
    })
    tmp = os.path.join(tv_dir, f"_tmp-{seg_id}-{uuid.uuid4().hex}.parquet")
    pq.write_table(tbl, tmp)
    try:
        os.rename(tmp, final)
    except OSError:
        os.unlink(tmp)


def _make_builder(catalog_root: str, content_col: str, doc_id_col: str,
                  stopwords: frozenset, store_positions: bool,
                  stemmer: str | None = None,
                  synonyms: dict | None = None,
                  discount_overlaps: bool = True,
                  sort_field: str | None = None,
                  sort_ascending: bool = True,
                  payload_delimiter: str | None = None,
                  tokenizer: str = "standard",
                  shingles: tuple | None = None,
                  ascii_folding: bool = False,
                  common_grams: frozenset | None = None,
                  store_term_vectors: bool = False,
                  elision: frozenset | None = None,
                  cjk_bigrams: int | None = None,
                  cjk_output_unigrams: bool = False,
                  ngrams: tuple | None = None,
                  ngram_edge: bool = False,
                  ngram_preserve_original: bool = False,
                  word_delimiter: int | None = None,
                  word_delimiter_protected: frozenset = frozenset(),
                  keyword_repeat: bool = False,
                  pattern_replace: tuple | None = None,
                  token_filters: tuple = (),
                  dictionary_compound=None,
                  capture_groups: tuple | None = None,
                  char_filters: tuple = (),
                  reverse_tokens: bool = False,
                  term_freq_delimiter: str | None = None,
                  keyword_marker: frozenset = frozenset(),
                  stemmer_override: dict | None = None,
                  phonetic: tuple | None = None,
                  hunspell: tuple | None = None,
                  min_hash: tuple | None = None,
                  concatenate_graph: bool | tuple = False,
                  icu_folding: bool | str = False):
    def build_one_segment(key, pdf):
        from pyspark import TaskContext
        seg_id = int(key[0])
        tc = TaskContext.get()
        part = tc.partitionId() if tc else -1
        postings, doc_meta, norms_payload, sum_token_len = invert_segment(
            pdf, seg_id, content_col, doc_id_col, stopwords, store_positions,
            stemmer, synonyms, discount_overlaps, sort_field,
            sort_ascending, payload_delimiter, tokenizer, shingles,
            ascii_folding, common_grams, elision,
            icu_folding=icu_folding,
            cjk_bigrams=cjk_bigrams,
            cjk_output_unigrams=cjk_output_unigrams,
            ngrams=ngrams, ngram_edge=ngram_edge,
            ngram_preserve_original=ngram_preserve_original,
            word_delimiter=word_delimiter,
            word_delimiter_protected=word_delimiter_protected,
            keyword_repeat=keyword_repeat,
            pattern_replace=pattern_replace,
            token_filters=token_filters,
            dictionary_compound=dictionary_compound,
            capture_groups=capture_groups,
            char_filters=char_filters,
            reverse_tokens=reverse_tokens,
            term_freq_delimiter=term_freq_delimiter,
            keyword_marker=keyword_marker,
            stemmer_override=stemmer_override,
            phonetic=phonetic,
            hunspell=hunspell,
            min_hash=min_hash,
            concatenate_graph=concatenate_graph)
        stats = _write_segment(catalog_root, seg_id, postings, doc_meta,
                               norms_payload, part,
                               sum_token_len=sum_token_len)
        if store_term_vectors and stats["status"] == "built":
            _write_term_vectors(catalog_root, seg_id, pdf, content_col,
                                doc_id_col, stopwords)
        return pd.DataFrame([{
            "seg_id": stats["seg_id"], "num_docs": stats["num_docs"],
            "num_terms": stats["num_terms"], "num_postings": stats["num_postings"],
            "sum_doc_len": stats["sum_doc_len"],
            "sum_token_len": stats.get("sum_token_len",
                                       stats["sum_doc_len"]),
            "bytes_compressed": stats["bytes_compressed"],
            "build_partition": stats["build_partition"], "status": stats["status"],
        }])
    return build_one_segment


def compute_term_stats(spark, catalog: SnapshotCatalog, seg_ids: list[int],
                       out_dir: str, buckets: int | None = None) -> str:
    """Global term statistics: df/ttf aggregated across ALL segments —
    the reference gathers these once per query across leaves
    (``index/TermStates.java:184-190``); we precompute them as a table.

    Skew note: inputs are already per-segment pre-aggregated rows (at most
    one row per (term, segment)), so a term's reduce-side group is bounded
    by the segment count — the map-side combine happened inside the segment
    kernel. No salting needed on this path.

    Layout: the dictionary is written range-bucketed by term (``buckets``
    sorted files, global term order across them) — every bucket keeps
    term-sorted row groups, so point/prefix probes (suggest, spell, query
    stats) still prune via parquet min/max, while the write parallelizes:
    a single-reducer write would serialize the entire vocabulary through
    one task (billions of terms at 10^12-doc scale). ``buckets`` defaults
    to the segment count — vocabulary grows with corpus, so the file count
    scales with it."""
    from pyspark.sql import functions as F
    paths = [os.path.join(catalog.segment_dir(s), "postings.parquet") for s in seg_ids]
    stats = (spark.read.parquet(*paths)
             .groupBy("term")
             .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf")))
    if buckets is None:
        buckets = max(1, len(seg_ids))
    (stats.repartitionByRange(buckets, "term").sortWithinPartitions("term")
     .write.mode("overwrite").parquet(out_dir))
    return out_dir


def build_index(spark, df, index_dir: str, *,
                num_segments: int = 32,
                content_col: str = "content",
                doc_id_col: str = "doc_id",
                stopwords: frozenset = frozenset(),
                stemmer: str | None = None,
                store_positions: bool = True,
                resume: bool = True,
                compute_stats: bool = True,
                seg_id_offset: int = 0,
                synonyms: dict | None = None,
                discount_overlaps: bool = True,
                sort_field: str | None = None,
                sort_ascending: bool = True,
                payload_delimiter: str | None = None,
                tokenizer: str = "standard",
                shingles: tuple | None = None,
                ascii_folding: bool = False,
                common_grams: frozenset | None = None,
                store_term_vectors: bool = False,
                elision: frozenset | None = None,
                cjk_bigrams: int | None = None,
                cjk_output_unigrams: bool = False,
                ngrams: tuple | None = None,
                ngram_edge: bool = False,
                ngram_preserve_original: bool = False,
                word_delimiter: int | None = None,
                word_delimiter_protected: frozenset = frozenset(),
                keyword_repeat: bool = False,
                pattern_replace: tuple | None = None,
                token_filters: tuple = (),
                dictionary_compound=None,
                capture_groups: tuple | None = None,
                char_filters: tuple = (),
                reverse_tokens: bool = False,
                term_freq_delimiter: str | None = None,
                keyword_marker: frozenset = frozenset(),
                stemmer_override: dict | None = None,
                phonetic: tuple | None = None,
                hunspell: tuple | None = None,
                min_hash: tuple | None = None,
                concatenate_graph: bool | tuple = False,
                icu_folding: bool | str = False):
    """Build (or resume) an index over ``df`` and commit a snapshot.

    ``df`` must carry a unique int64 ``doc_id`` column — the global docID
    and tie-break order (the role of Lucene's docBase+local docID).
    Returns the committed :class:`Snapshot`.

    ``store_term_vectors`` writes a per-doc (terms, starts, ends) offset
    sidecar alongside the segments (the reference's term-vectors files,
    ``Lucene90CompressingTermVectorsWriter``) — consumed by
    :func:`operators.highlight.highlight_tv` to highlight without
    re-analysis. Stored keyed by GLOBAL doc_id at the index level (not
    per segment), so merges never rewrite it — the Spark-native shape of
    "term vectors survive merges by bulk copy". Standard chain only:
    token-rewriting filters would break offset→source-slice meaning.
    """
    from pyspark.sql import functions as F

    from ..session import ensure_shipped
    ensure_shipped(spark)
    if shingles and (synonyms or payload_delimiter):
        raise ValueError("shingles are mutually exclusive with "
                         "synonyms and payloads")
    if common_grams and (synonyms or payload_delimiter or shingles):
        raise ValueError("common_grams is mutually exclusive with "
                         "synonyms, payloads and shingles")
    if store_term_vectors and (stemmer or synonyms or shingles
                               or common_grams or ascii_folding or elision
                               or cjk_bigrams is not None
                               or ngrams is not None
                               or word_delimiter is not None
                               or char_filters
                               or tokenizer != "standard"):
        raise ValueError("term vectors require the plain standard chain "
                         "(offsets must slice the source text)")
    catalog = SnapshotCatalog(index_dir)
    work = df.withColumn(SHA_COL, F.sha2(F.col(content_col).cast("string"), 256))
    work = work.withColumn(SEG_COL,
                           (F.pmod(F.col(doc_id_col), F.lit(num_segments))
                            + F.lit(seg_id_offset)).cast("int"))

    durable = {sid: st for sid, st in catalog.durable_segments().items()
               if st.get("origin", "build") == "build"}
    if resume and durable:
        work = work.filter(~F.col(SEG_COL).isin(list(durable.keys())))

    builder = _make_builder(index_dir, content_col, doc_id_col,
                            frozenset(stopwords), store_positions, stemmer,
                            synonyms, discount_overlaps,
                            sort_field, sort_ascending, payload_delimiter,
                            tokenizer, shingles, ascii_folding,
                            common_grams, store_term_vectors, elision,
                            icu_folding=icu_folding,
                            cjk_bigrams=cjk_bigrams,
                            cjk_output_unigrams=cjk_output_unigrams,
                            ngrams=ngrams, ngram_edge=ngram_edge,
                            ngram_preserve_original=ngram_preserve_original,
                            word_delimiter=word_delimiter,
                            word_delimiter_protected=word_delimiter_protected,
                            keyword_repeat=keyword_repeat,
                            pattern_replace=pattern_replace,
                            token_filters=token_filters,
                            dictionary_compound=dictionary_compound,
                            capture_groups=capture_groups,
                            char_filters=char_filters,
                            reverse_tokens=reverse_tokens,
                            term_freq_delimiter=term_freq_delimiter,
                            keyword_marker=keyword_marker,
                            stemmer_override=stemmer_override,
                            phonetic=phonetic,
                            hunspell=hunspell,
                            min_hash=min_hash,
                            concatenate_graph=concatenate_graph)
    new_stats = (work.repartition(num_segments, F.col(SEG_COL))
                 .groupBy(SEG_COL)
                 .applyInPandas(builder, schema=STATS_SCHEMA)
                 .collect())

    seg_stats: dict[int, dict] = dict(durable)
    for row in new_stats:
        seg_stats[row["seg_id"]] = {**row.asDict(), "origin": "build"}
    segments = [seg_stats[s] for s in sorted(seg_stats)]

    field_stats = {
        "doc_count": int(sum(s["num_docs"] for s in segments)),
        "sum_total_term_freq": int(sum(
            s.get("sum_token_len", s["sum_doc_len"]) for s in segments)),
    }
    latest = catalog.load()
    next_id = (latest.snapshot_id + 1) if latest else 1
    ts_path = None
    if compute_stats:
        ts_path = compute_term_stats(
            spark, catalog, [s["seg_id"] for s in segments],
            os.path.join(index_dir, "term_stats", f"gen-{next_id}"))
    from ..functions.codec import CODEC_VERSION
    extra = {"num_segments": num_segments,
             "doc_id_col": doc_id_col,
             "store_positions": store_positions,
             "codec_version": CODEC_VERSION}
    if sort_field is not None:
        extra["index_sort"] = {"field": sort_field,
                               "ascending": bool(sort_ascending)}
    if payload_delimiter is not None:
        extra["payloads"] = True
    if shingles is not None:
        extra["shingles"] = list(shingles)
    if common_grams:
        extra["common_grams"] = sorted(common_grams)
    if store_term_vectors or (latest and
                              (latest.extra or {}).get("term_vectors")):
        extra["term_vectors"] = True
    return catalog.commit(segments, field_stats, ts_path, extra=extra)
