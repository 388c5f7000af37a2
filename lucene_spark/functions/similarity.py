"""Pluggable scoring strategies (the reference's ``Similarity`` extension
point: ``search/similarities/Similarity.java`` with 13 implementations —
BM25, Classic TF-IDF, DFR, LM…).

A Similarity supplies three kernels, all float32-faithful and vectorized:

* ``weight(df, doc_count, boost)``   — query-time term weight
* ``norm_cache(avgdl)``              — 256-entry per-norm-byte factor
* ``score(tfs, norm_bytes, weight, cache)`` — per-posting scores

``monotonic`` declares that score is non-decreasing in tf and in the
cached norm factor — the property that makes block-max pruning safe
(reference comment at ``BM25Similarity.java:252-262``); non-monotonic
similarities automatically fall back to exhaustive scoring.

The index layout is similarity-independent: norms store the SmallFloat
4-bit quantized field length (``intToByte4``), and every similarity
decodes document length through the same LENGTH_TABLE.
"""

from __future__ import annotations

import numpy as np

from . import bm25
from .smallfloat import LENGTH_TABLE


class Similarity:
    name = "base"
    monotonic = True
    #: scores are >= 0 — the block-max window kernel prunes windows with
    #: upper bound <= 0, so a similarity that can emit negative scores
    #: (IndriDirichlet) must clear this to fall back to exhaustive.
    nonnegative = True
    #: score is weight-multiplicative (score(w1+w2) == score(w1)+score(w2)
    #: for fixed tf/norm); phrase/synonym weights may be pre-summed.
    weight_linear = True
    #: weight() needs term ttf + collection sum_ttf (LM family).
    needs_ttf = False

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0):  # pragma: no cover
        raise NotImplementedError

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def score(self, tfs: np.ndarray, norm_bytes: np.ndarray,
              weight: np.float32,
              cache: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


class BM25Similarity(Similarity):
    """The default (reference ``BM25Similarity.java``; searcher default at
    ``search/IndexSearcher.java:116``)."""

    name = "bm25"
    monotonic = True

    def __init__(self, k1: float = bm25.K1_DEFAULT, b: float = bm25.B_DEFAULT):
        self.k1 = k1
        self.b = b

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0) -> np.float32:
        return np.float32(np.float32(boost) * bm25.idf(df, doc_count))

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        return bm25.norm_inverse_cache(avgdl, self.k1, self.b)

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        return bm25.score_block(tfs, norm_bytes, weight, cache)


class ClassicSimilarity(Similarity):
    """Lucene's pre-BM25 TF-IDF (reference ``similarities/
    ClassicSimilarity.java:63-66`` / ``TFIDFSimilarity.java:482-522``):

      idf   = (float)(ln((docCount+1) / (df+1)) + 1)   (ClassicSimilarity.java:66)
      tf    = (float)sqrt(freq)                        (double sqrt, float cast)
      norm  = normTable[b] with normTable[i] = (float)(1/sqrt(byte4ToInt(i)))
              and normTable[0] = 1/normTable[255]      (TFIDFSimilarity.java:482-488)
      score = (tf * queryWeight) * norm, queryWeight = boost * idf applied
              ONCE (TFIDFSimilarity.java:508,521-523 — the idf² in the class
              javadoc is the conceptual queryNorm-era formula, not the code)

    Monotonic in tf and in the norm factor → block-max safe.
    """

    name = "classic"
    monotonic = True

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0) -> np.float32:
        idf = np.float32(np.log((doc_count + 1) / (df + 1.0)) + 1.0)
        return np.float32(np.float32(boost) * idf)

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        with np.errstate(divide="ignore"):
            inv = (1.0 / np.sqrt(LENGTH_TABLE.astype(np.float64))) \
                .astype(np.float32)
        inv[0] = np.float32(1.0) / inv[255]
        return inv

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        tf = np.sqrt(np.asarray(tfs, dtype=np.float64)).astype(np.float32)
        inv = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        return ((tf * weight) * inv).astype(np.float32)


class LMDirichletSimilarity(Similarity):
    """Language model with Bayesian (Dirichlet-prior) smoothing
    (reference ``similarities/LMDirichletSimilarity.java:70-77``, default
    μ=2000 at ``:66-68``; collection model p(w|C) = (ttf+1)/(sumTtf+1),
    ``LMSimilarity.java:144-147``):

      score = boost · (ln(1 + tf/(μ·p)) + ln(μ/(dl + μ)))   (double math)
      clamped at 0, cast to float32 at the end
      (SimilarityBase.SimScorer casts once: ``SimilarityBase.java:223-225``)

    dl is the SmallFloat-quantized field length decoded from the shared
    norm byte (``SimilarityBase.java:174-180,218-220``). The per-term
    weight carries (boost, 1/(μ·p)) as float64; the norm cache holds
    ln(μ/(dl+μ)) per norm byte. Monotonic ↑tf and ↓dl → block-max safe.
    """

    name = "lm_dirichlet"
    monotonic = True
    weight_linear = False
    needs_ttf = True

    def __init__(self, mu: float = 2000.0):
        if not (mu >= 0 and np.isfinite(mu)):
            raise ValueError(f"illegal mu value: {mu}")
        self.mu = float(mu)

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0) -> np.ndarray:
        p = (ttf + 1.0) / (sum_ttf + 1.0)
        return np.array([float(boost), 1.0 / (self.mu * p)],
                        dtype=np.float64)

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        return np.log(self.mu / (LENGTH_TABLE.astype(np.float64) + self.mu))

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        boost, inv_mu_p = float(weight[0]), float(weight[1])
        dnorm = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        s = boost * (np.log(1.0 + np.asarray(tfs, np.float64) * inv_mu_p)
                     + dnorm)
        return np.maximum(s, 0.0).astype(np.float32)


class LMJelinekMercerSimilarity(Similarity):
    """Language model with Jelinek-Mercer smoothing (reference
    ``similarities/LMJelinekMercerSimilarity.java:62-68``):

      score = boost · ln(1 + ((1-λ)·tf/dl) / (λ·p))   (double, then float32)

    Always positive. Weight carries (boost, (1-λ)/(λ·p)); the norm cache
    holds the quantized dl per norm byte. Monotonic ↑tf, ↓dl.
    """

    name = "lm_jelinek_mercer"
    monotonic = True
    weight_linear = False
    needs_ttf = True

    def __init__(self, lam: float = 0.1):
        if not (0 < lam <= 1):
            raise ValueError("lambda must be in the range (0 .. 1]")
        # the reference's lambda is a FLOAT field (:42); (1 - lambda)
        # is a float32 op; lambda * p widens the float (real-Lucene
        # differential, q73)
        self.lam = float(np.float32(lam))

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0) -> np.ndarray:
        p = (ttf + 1.0) / (sum_ttf + 1.0)
        one_minus = float(np.float32(np.float32(1.0)
                                     - np.float32(self.lam)))
        return np.array([float(boost), one_minus, self.lam * p],
                        dtype=np.float64)

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        return LENGTH_TABLE.astype(np.float64)

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        # exact Java grouping (:62): ((1-λ)·freq/docLen) / (λ·p)
        boost, one_minus, lam_p = (float(weight[0]), float(weight[1]),
                                   float(weight[2]))
        dl = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        with np.errstate(divide="ignore"):
            s = boost * np.log(1.0 + (one_minus
                                      * np.asarray(tfs, np.float64) / dl)
                               / lam_p)
        return s.astype(np.float32)


class DFRInL2Similarity(Similarity):
    """Divergence-from-randomness, configuration I(n)L2 (reference
    ``similarities/DFRSimilarity.java:104-107`` composing
    ``BasicModelIn.java:34-44`` (A = log2((N+1)/(df+0.5)), score =
    A·ae·(1 − 1/(1+tfn))), ``AfterEffectL.java:32-33`` (ae·(1+tfn) = 1)
    and ``NormalizationH2.java:56-58`` (tfn = tf·log2(1 + c·avgdl/dl),
    default c=1 at ``:52-54``)):

      tfn   = tf · log2(1 + c·avgdl/dl)       (dl = quantized length)
      score = boost · (A · 1 · (1 − 1/(1+tfn)))   (double, cast float32)

    avgdl here is the engine's shared float32 avgdl widened to double
    (the reference keeps it double throughout — a ≤1-ulp-of-float32
    difference; engine and oracle share the same value, so parity tests
    are exact). Monotonic ↑tf, ↓dl → block-max safe.
    """

    name = "dfr_inl2"
    monotonic = True
    weight_linear = False

    def __init__(self, c: float = 1.0):
        if not (c >= 0 and np.isfinite(c)):
            raise ValueError(f"illegal c value: {c}")
        self.c = float(c)

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0) -> np.ndarray:
        a = np.log((doc_count + 1) / (df + 0.5)) / np.log(2.0)
        return np.array([float(boost), float(a)], dtype=np.float64)

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        with np.errstate(divide="ignore"):
            return (np.log(1.0 + self.c * np.float64(avgdl)
                           / LENGTH_TABLE.astype(np.float64))
                    / np.log(2.0))

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        boost, a = float(weight[0]), float(weight[1])
        tfn = np.asarray(tfs, np.float64) \
            * cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        basic = (a * 1.0) * (1.0 - 1.0 / (1.0 + tfn))
        return (boost * basic).astype(np.float32)


class BooleanSimilarity(Similarity):
    """Score = query boost, norms and tf ignored (reference
    ``similarities/BooleanSimilarity.java:25-62``). Constant per term →
    monotonic and block-max safe trivially."""

    name = "boolean"
    monotonic = True
    weight_linear = True

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0) -> np.float32:
        return np.float32(boost)

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        return np.zeros(256, dtype=np.float32)

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        return np.full(len(np.asarray(tfs)), np.float32(weight),
                       dtype=np.float32)


class DFISimilarity(Similarity):
    """Divergence from Independence (reference
    ``similarities/DFISimilarity.java:58-69`` over the three
    ``Independence*`` measures):

      expected = (ttf + 1) · dl / (sumTtf + 1)       (double)
      score    = 0                          if tf <= expected
               = boost · log2(measure + 1)  else      (cast float32 once)

    measure: 'standardized' (tf−e)/√e (``IndependenceStandardized``),
    'saturated' (tf−e)/e (``IndependenceSaturated``), 'chisquared'
    (tf−e)²/e (``IndependenceChiSquared``). dl is the quantized length
    decoded from the shared norm byte (SimilarityBase). NOT monotonic in
    the norm factor (longer docs can score 0 where shorter ones match),
    so block-max pruning is disabled → exhaustive scoring."""

    name = "dfi"
    monotonic = False
    weight_linear = False
    needs_ttf = True

    MEASURES = ("standardized", "saturated", "chisquared")

    def __init__(self, measure: str = "standardized"):
        if measure not in self.MEASURES:
            raise ValueError(f"unknown independence measure {measure!r}")
        self.measure = measure

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0) -> np.ndarray:
        # expected = weight[1] * dl
        return np.array([float(boost), (ttf + 1.0) / (sum_ttf + 1.0)],
                        dtype=np.float64)

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        return LENGTH_TABLE.astype(np.float64)

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        boost, efactor = float(weight[0]), float(weight[1])
        dl = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        f = np.asarray(tfs, np.float64)
        expected = efactor * dl
        diff = f - expected
        with np.errstate(divide="ignore", invalid="ignore"):
            if self.measure == "standardized":
                m = diff / np.sqrt(expected)
            elif self.measure == "saturated":
                m = diff / expected
            else:
                m = diff * diff / expected
        s = boost * (np.log(m + 1.0) / np.log(2.0))
        return np.where(f <= expected, 0.0, s).astype(np.float32)


class SweetSpotSimilarity(ClassicSimilarity):
    """ClassicSimilarity with plateaued length norm and baseline tf
    (reference ``misc/SweetSpotSimilarity.java:30-160``):

      lengthNorm(L) = (float)(1 / sqrt(steep·(|L−min| + |L−max|
                                              − (max−min)) + 1))  (:103-115)
        — flat 1.0 inside [ln_min, ln_max], sloping off outside
      baselineTf(f) = tf_base                       if f <= tf_min
                    = (float)sqrt(f + tf_base² − tf_min)  else     (:131-141)

    hyperbolicTf (:148-168) is available via ``tf_mode='hyperbolic'``.
    Norms decode through the shared quantized length table (modern
    TFIDFSimilarity builds its normTable from lengthNorm(byte4ToInt(i));
    the plateau is applied to the decoded length). Monotonic in tf and
    the cached norm factor → block-max safe."""

    name = "sweetspot"
    monotonic = True

    def __init__(self, ln_min: int = 1, ln_max: int = 1,
                 ln_steep: float = 0.5, tf_base: float = 0.0,
                 tf_min: float = 0.0, tf_mode: str = "baseline",
                 hyper: tuple = (0.0, 2.0, 1.3, 10.0)):
        if tf_mode not in ("baseline", "hyperbolic"):
            raise ValueError(f"unknown tf_mode {tf_mode!r}")
        self.ln_min, self.ln_max = int(ln_min), int(ln_max)
        self.ln_steep = np.float32(ln_steep)
        self.tf_base, self.tf_min = np.float32(tf_base), np.float32(tf_min)
        self.tf_mode = tf_mode
        self.hyper = hyper

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        L = LENGTH_TABLE.astype(np.int64)
        inner = (self.ln_steep
                 * (np.abs(L - self.ln_min) + np.abs(L - self.ln_max)
                    - (self.ln_max - self.ln_min)).astype(np.float32))
        with np.errstate(divide="ignore"):
            tab = (1.0 / np.sqrt((inner + np.float32(1.0))
                                 .astype(np.float64))).astype(np.float32)
        tab[0] = np.float32(1.0) / tab[255]
        return tab

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        f = np.asarray(tfs, dtype=np.float32)
        if self.tf_mode == "baseline":
            tf = np.where(
                f <= self.tf_min, self.tf_base,
                np.sqrt((f + (self.tf_base * self.tf_base) - self.tf_min)
                        .astype(np.float64)).astype(np.float32))
        else:
            # (:155-173) result = min + (float)((max-min)/2f ·
            #   (tanh-term + 1.0)), NaN → max
            mn, mx, base, xoff = self.hyper
            x = (f - np.float32(xoff)).astype(np.float64)
            half = np.float64(np.float32(np.float32(mx) - np.float32(mn))
                              / np.float32(2.0))
            tanh = ((np.power(base, x) - np.power(base, -x))
                    / (np.power(base, x) + np.power(base, -x)))
            val = (np.float32(mn)
                   + (half * (tanh + 1.0)).astype(np.float32))
            tf = np.where(np.isnan(val), np.float32(mx),
                          val.astype(np.float32))
        tf = np.where(f == 0.0, np.float32(0.0), tf)
        inv = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        return ((tf * weight) * inv).astype(np.float32)


class IBSimilarity(Similarity):
    """Information-based framework (reference ``similarities/
    IBSimilarity.java:36-60``: score = boost · distribution(tfn, λ)
    composed from a Distribution × Lambda × Normalization):

    distributions (``DistributionLL.java:29-31``, ``DistributionSPL
    .java:30-57``):
      LL:  −ln(λ / (tfn + λ))
      SPL: q = 1 − 1/(tfn+1)  (nextDown(1.0) if q == 1);
           pow = λ^q, nudged one double-ulp off λ when rounding collapses
           them (λ<1 → nextUp, else nextDown); −ln((pow − λ)/(1 − λ))

    lambdas, computed as FLOAT casts like the reference
    (``LambdaDF.java:33-40``, ``LambdaTTF.java:33-41``; the nextDown/
    nextUp at exactly 1 keeps SPL's ratio finite):
      df:  (df + 1)/(N + 1)      ttf: (ttf + 1)/(N + 1)

    normalizations (``NormalizationH1/H2/H3/Z.java``, ``Normalization
    .java`` NoNormalization):
      h1: tf·c·avgdl/dl   h2: tf·log2(1 + c·avgdl/dl)
      h3: (tf + μ·(ttf+1)/(sumTtf+1)) / (dl + μ) · μ
      z:  tf·(avgdl/dl)^z   none: tf

    avgdl is the engine's shared float32 avgdl widened to double (same
    convention as DFRInL2Similarity; engine and oracle share the value,
    so parity is exact). All math double, one float32 cast at the end
    (``SimilarityBase.java:223-225``). Every composition is monotonic
    ↑tf / ↓dl → block-max safe.
    """

    name = "ib"
    monotonic = True
    weight_linear = False

    DISTRIBUTIONS = ("ll", "spl")
    LAMBDAS = ("df", "ttf")
    NORMALIZATIONS = ("h1", "h2", "h3", "z", "none")

    def __init__(self, distribution: str = "spl", lambda_: str = "df",
                 normalization: str = "h2", c: float = 1.0,
                 mu: float = 800.0, z: float = 0.30):
        if distribution not in self.DISTRIBUTIONS:
            raise ValueError(f"unknown distribution {distribution!r}")
        if lambda_ not in self.LAMBDAS:
            raise ValueError(f"unknown lambda {lambda_!r}")
        if normalization not in self.NORMALIZATIONS:
            raise ValueError(f"unknown normalization {normalization!r}")
        self.distribution = distribution
        self.lambda_ = lambda_
        self.normalization = normalization
        self.c, self.mu, self.z = float(c), float(mu), float(z)
        self.needs_ttf = (lambda_ == "ttf") or (normalization == "h3")

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0) -> np.ndarray:
        # LambdaDF/LambdaTTF divide IN FLOAT ((df + 1F) / (N + 1F)) —
        # a double division rounded to float differs by 1 ulp on some
        # counts (pinned by the real-Lucene differential, q77)
        if self.lambda_ == "df":
            lam = np.float32(np.float32(df + 1.0)
                             / np.float32(doc_count + 1.0))
            if lam == np.float32(1.0):
                lam = np.nextafter(lam, np.float32(0.0))
        else:
            lam = np.float32(np.float32(ttf + 1.0)
                             / np.float32(doc_count + 1.0))
            if lam == np.float32(1.0):
                lam = np.nextafter(lam, np.float32(2.0))
        # H3's additive smoothing term μ·(ttf+1)/(sumTtf+1)
        mu_p = (self.mu * (ttf + 1.0) / (sum_ttf + 1.0)
                if self.normalization == "h3" else 0.0)
        return np.array([float(boost), float(lam), mu_p], dtype=np.float64)

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        dl = LENGTH_TABLE.astype(np.float64)
        a = np.float64(avgdl)
        with np.errstate(divide="ignore"):
            if self.normalization == "h1":
                return self.c * a / dl
            if self.normalization == "h2":
                return np.log(1.0 + self.c * a / dl) / np.log(2.0)
            if self.normalization == "z":
                return np.power(a / dl, self.z)
            return dl  # h3 and none carry the raw quantized length

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        boost, lam, mu_p = (float(weight[0]), float(weight[1]),
                            float(weight[2]))
        f = np.asarray(tfs, np.float64)
        cv = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        if self.normalization in ("h1", "h2", "z"):
            tfn = f * cv
        elif self.normalization == "h3":
            tfn = (f + mu_p) / (cv + self.mu) * self.mu
        else:
            tfn = f
        if self.distribution == "ll":
            s = -np.log(lam / (tfn + lam))
        else:
            q = 1.0 - 1.0 / (tfn + 1.0)
            q = np.where(q == 1.0, np.nextafter(1.0, 0.0), q)
            pow_ = np.power(lam, q)
            # DistributionSPL.java:38-52 — keep pow off λ so the log
            # stays finite when rounding collapses them
            nudge = (np.nextafter(lam, np.inf) if lam < 1
                     else np.nextafter(lam, -np.inf))
            pow_ = np.where(pow_ == lam, nudge, pow_)
            s = -np.log((pow_ - lam) / (1.0 - lam))
        return (boost * s).astype(np.float32)


class AxiomaticSimilarity(Similarity):
    """Axiomatic retrieval functions F1EXP/F1LOG/F2EXP/F2LOG (reference
    ``similarities/Axiomatic.java:96-107`` — score = boost ·
    max(0, tf·ln·tfln·idf − gamma), gamma = 0 for the F1/F2 family;
    defaults s=0.25, k=0.35 at ``Axiomatic.java:91-93``):

      F1 (``AxiomaticF1EXP.java:55-75``, ``AxiomaticF1LOG.java``):
        tf  = 1 + ln(1 + ln(freq))
        ln  = (avgdl + s) / (avgdl + dl·s)          tfln = 1
      F2 (``AxiomaticF2EXP.java:58-77``, ``AxiomaticF2LOG.java``):
        tf = 1, ln = 1
        tfln = freq / (freq + s + s·dl/avgdl)
      idf: EXP → ((N + 1)/df)^k     LOG → ln((N + 1)/df)

    All math double, one float32 cast (``SimilarityBase`` scorer).
    Each component is monotone ↑freq and the length components are
    monotone ↓dl → block-max safe.
    """

    name = "axiomatic"
    monotonic = True
    weight_linear = False

    VARIANTS = ("f1exp", "f1log", "f2exp", "f2log")

    def __init__(self, variant: str = "f2log", s: float = 0.25,
                 k: float = 0.35):
        if variant not in self.VARIANTS:
            raise ValueError(f"unknown axiomatic variant {variant!r}")
        self.variant = variant
        self.s, self.k = float(s), float(k)

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0) -> np.ndarray:
        if self.variant.endswith("exp"):
            idf = np.power((doc_count + 1.0) / df, self.k)
        else:
            idf = np.log((doc_count + 1.0) / df)
        return np.array([float(boost), float(idf)], dtype=np.float64)

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        dl = LENGTH_TABLE.astype(np.float64)
        a = np.float64(avgdl)
        if self.variant.startswith("f1"):
            return (a + self.s) / (a + dl * self.s)
        return self.s + self.s * dl / a

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        boost, idf = float(weight[0]), float(weight[1])
        f = np.asarray(tfs, np.float64)
        cv = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        with np.errstate(divide="ignore", invalid="ignore"):
            if self.variant.startswith("f1"):
                comp = (1.0 + np.log(1.0 + np.log(f))) * cv
            else:
                comp = f / (f + cv)
        s = boost * np.maximum(comp * idf, 0.0)
        return np.where(f == 0.0, np.float32(0.0),
                        s.astype(np.float32))


class IndriDirichletSimilarity(Similarity):
    """Indri's Dirichlet-smoothed language model (reference
    ``similarities/IndriDirichletSimilarity.java:44-49`` with
    ``IndriCollectionModel``: p(w|C) = ttf / sumTtf, NO +1 smoothing):

      score = ln((freq + μ·p) / (dl + μ))      (double, float32 cast)

    Faithful quirks mirrored: the query boost is NOT applied (the
    reference's score() ignores stats.getBoost()), and scores are
    typically NEGATIVE (log of a probability). The score IS monotonic
    ↑freq / ↓dl, but the engine's window kernel treats an upper bound
    of 0 as "cannot compete", so negative-score similarities clear
    ``nonnegative`` and score exhaustively.
    """

    name = "indri_dirichlet"
    monotonic = True
    nonnegative = False
    weight_linear = False
    needs_ttf = True

    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0) -> np.ndarray:
        cp = float(ttf) / float(sum_ttf) if sum_ttf else 0.0
        return np.array([self.mu * cp], dtype=np.float64)

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        return LENGTH_TABLE.astype(np.float64)

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        mu_cp = float(weight[0])
        dl = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        f = np.asarray(tfs, np.float64)
        return np.log((f + mu_cp) / (dl + self.mu)).astype(np.float32)


class MultiSimilarity(Similarity):
    """Sum of sub-similarity scores (reference ``similarities/
    MultiSimilarity.java:58-66``: MultiSimScorer accumulates each
    sub-scorer's float32 score into a float32 running sum, in order).

    The weight is the tuple of sub-weights and the cache the tuple of
    sub-caches (both opaque to the engine — everything flows through
    ``score``). Monotonic/nonnegative iff every sub-similarity is, so
    block-max pruning stays sound exactly when each addend is a valid
    monotone non-negative bound.
    """

    name = "multi"
    weight_linear = False

    def __init__(self, sims: list):
        if not sims:
            raise ValueError("MultiSimilarity needs at least one sub-sim")
        self.sims = list(sims)
        self.monotonic = all(s.monotonic for s in self.sims)
        self.nonnegative = all(getattr(s, "nonnegative", True)
                               for s in self.sims)
        self.needs_ttf = any(getattr(s, "needs_ttf", False)
                             for s in self.sims)

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               ttf: int = 0, sum_ttf: int = 0) -> tuple:
        return tuple(s.weight(df, doc_count, boost, ttf, sum_ttf)
                     for s in self.sims)

    def norm_cache(self, avgdl: np.float32) -> tuple:
        return tuple(s.norm_cache(avgdl) for s in self.sims)

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        total = np.zeros(len(np.asarray(tfs)), dtype=np.float32)
        for s, w, c in zip(self.sims, weight, cache):
            total = total + s.score(tfs, norm_bytes, w, c)
        return total.astype(np.float32)


SIMILARITIES = {"bm25": BM25Similarity, "classic": ClassicSimilarity,
                "lm_dirichlet": LMDirichletSimilarity,
                "lm_jelinek_mercer": LMJelinekMercerSimilarity,
                "dfr_inl2": DFRInL2Similarity,
                "boolean": BooleanSimilarity,
                "dfi": DFISimilarity,
                "sweetspot": SweetSpotSimilarity,
                "ib": IBSimilarity,
                "axiomatic": AxiomaticSimilarity,
                "indri_dirichlet": IndriDirichletSimilarity,
                "multi": MultiSimilarity}
