"""Generate REAL-Lucene top-10 goldens for the engine's core query
surface — the BASELINE.json headline metric is "BM25 top-10
rank-identical match rate on the reference query set", and this tool
produces that comparison directly against the reference: lucene-core
10.0.0 compiles clean from the reference tree with plain javac, so we
index the sf0.001 documents fixture with the REAL IndexWriter
(StandardAnalyzer, empty stop set, single forceMerged segment, docID =
insertion order = doc_id) and run every core query shape with the REAL
IndexSearcher, recording (doc_id, float-bits score) per hit.

tests/test_lucene_differential.py replays the same queries through the
engine's float32-exact scoring oracle and requires BIT-IDENTICAL
scores and identical ranking.

Usage:  python tools/gen_lucene_goldens.py
"""

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORE_SRC = "/root/reference/lucene/core/src/java"
GOLDEN_DIR = os.path.join(REPO, "tests", "data", "lucene_diff")

MAIN_JAVA = r"""
import java.io.*;
import java.nio.charset.StandardCharsets;
import java.nio.file.*;
import java.util.*;
import org.apache.lucene.analysis.*;
import org.apache.lucene.analysis.standard.StandardAnalyzer;
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;
import org.apache.lucene.queries.spans.*;
import org.apache.lucene.queries.intervals.*;
import org.apache.lucene.search.similarities.*;

public class LuceneGoldenMain {
  static final String F = "content";

  static Similarity sim(String name) {
    switch (name) {
      case "classic": return new ClassicSimilarity();
      case "lmd": return new LMDirichletSimilarity();
      case "lmjm": return new LMJelinekMercerSimilarity(0.7f);
      case "dfr_inl2": return new DFRSimilarity(
          new BasicModelIn(), new AfterEffectL(), new NormalizationH2());
      case "boolean": return new BooleanSimilarity();
      case "dfi": return new DFISimilarity(new IndependenceStandardized());
      case "ib_ll": return new IBSimilarity(
          new DistributionLL(), new LambdaDF(), new NormalizationH2());
      case "ax_f2log": return new AxiomaticF2LOG();
      case "indri": return new IndriDirichletSimilarity();
      case "multi": return new MultiSimilarity(new Similarity[] {
          new BM25Similarity(), new ClassicSimilarity()});
      default: throw new IllegalArgumentException(name);
    }
  }

  static Query parse(String[] p) {
    switch (p[1]) {
      case "term": {
        Query q = new TermQuery(new Term(F, p[2]));
        return p.length > 3 ? new BoostQuery(q, Float.parseFloat(p[3])) : q;
      }
      case "and": {
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 2; i < p.length; i++)
          b.add(new TermQuery(new Term(F, p[i])), BooleanClause.Occur.MUST);
        return b.build();
      }
      case "or": {
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        b.setMinimumNumberShouldMatch(Integer.parseInt(p[2]));
        for (int i = 3; i < p.length; i++)
          b.add(new TermQuery(new Term(F, p[i])), BooleanClause.Occur.SHOULD);
        return b.build();
      }
      case "reqopt": {
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        b.add(new TermQuery(new Term(F, p[2])), BooleanClause.Occur.MUST);
        b.add(new TermQuery(new Term(F, p[3])), BooleanClause.Occur.SHOULD);
        return b.build();
      }
      case "not": {
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        b.add(new TermQuery(new Term(F, p[2])), BooleanClause.Occur.MUST);
        b.add(new TermQuery(new Term(F, p[3])), BooleanClause.Occur.MUST_NOT);
        return b.build();
      }
      case "phrase": {
        int slop = Integer.parseInt(p[2]);
        return new PhraseQuery(slop, F,
            Arrays.copyOfRange(p, 3, p.length));
      }
      case "dismax": {
        float tie = Float.parseFloat(p[2]);
        List<Query> qs = new ArrayList<>();
        for (int i = 3; i < p.length; i++)
          qs.add(new TermQuery(new Term(F, p[i])));
        return new DisjunctionMaxQuery(qs, tie);
      }
      case "synonym": {
        SynonymQuery.Builder b = new SynonymQuery.Builder(F);
        for (int i = 2; i < p.length; i++) b.addTerm(new Term(F, p[i]));
        return b.build();
      }
      case "prefix": {
        PrefixQuery q = new PrefixQuery(new Term(F, p[2]));
        q.setRewriteMethod(MultiTermQuery.CONSTANT_SCORE_REWRITE);
        return q;
      }
      case "wildcard": {
        WildcardQuery q = new WildcardQuery(new Term(F, p[2]));
        q.setRewriteMethod(MultiTermQuery.CONSTANT_SCORE_REWRITE);
        return q;
      }
      case "fuzzy":
        return new FuzzyQuery(new Term(F, p[3]), Integer.parseInt(p[2]));
      case "gapphrase": {  // gapphrase <slop> pos:term ...
        PhraseQuery.Builder b = new PhraseQuery.Builder();
        b.setSlop(Integer.parseInt(p[2]));
        for (int i = 3; i < p.length; i++) {
          String[] pt = p[i].split(":");
          b.add(new Term(F, pt[1]), Integer.parseInt(pt[0]));
        }
        return b.build();
      }
      case "multiphrase": {  // multiphrase t1a|t1b t2 ...
        MultiPhraseQuery.Builder b = new MultiPhraseQuery.Builder();
        for (int i = 2; i < p.length; i++) {
          String[] alts = p[i].split("\\|");
          Term[] ts = new Term[alts.length];
          for (int j = 0; j < alts.length; j++) ts[j] = new Term(F, alts[j]);
          b.add(ts);
        }
        return b.build();
      }
      case "mpslop": {  // mpslop <slop> t1a|t1b t2 ...  (sloppy multiphrase)
        MultiPhraseQuery.Builder b = new MultiPhraseQuery.Builder();
        b.setSlop(Integer.parseInt(p[2]));
        for (int i = 3; i < p.length; i++) {
          String[] alts = p[i].split("\\|");
          Term[] ts = new Term[alts.length];
          for (int j = 0; j < alts.length; j++) ts[j] = new Term(F, alts[j]);
          b.add(ts);
        }
        return b.build();
      }
      case "common": {  // common <maxTF> t1 t2 ...
        org.apache.lucene.queries.CommonTermsQuery q =
            new org.apache.lucene.queries.CommonTermsQuery(
                BooleanClause.Occur.SHOULD, BooleanClause.Occur.SHOULD,
                Float.parseFloat(p[2]));
        for (int i = 3; i < p.length; i++) q.add(new Term(F, p[i]));
        return q;
      }
      case "filterq": {  // MUST t1 + FILTER t2
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        b.add(new TermQuery(new Term(F, p[2])), BooleanClause.Occur.MUST);
        b.add(new TermQuery(new Term(F, p[3])), BooleanClause.Occur.FILTER);
        return b.build();
      }
      case "filteror": {  // SHOULD t1 t2 + FILTER t3
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        b.add(new TermQuery(new Term(F, p[2])), BooleanClause.Occur.SHOULD);
        b.add(new TermQuery(new Term(F, p[3])), BooleanClause.Occur.SHOULD);
        b.add(new TermQuery(new Term(F, p[4])), BooleanClause.Occur.FILTER);
        return b.build();
      }
      case "nested": {  // MUST t1 + SHOULD (t2 OR t3)
        BooleanQuery.Builder inner = new BooleanQuery.Builder();
        inner.add(new TermQuery(new Term(F, p[3])), BooleanClause.Occur.SHOULD);
        inner.add(new TermQuery(new Term(F, p[4])), BooleanClause.Occur.SHOULD);
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        b.add(new TermQuery(new Term(F, p[2])), BooleanClause.Occur.MUST);
        b.add(inner.build(), BooleanClause.Occur.SHOULD);
        return b.build();
      }
      case "range":
        return new ConstantScoreQuery(TermRangeQuery.newStringRange(
            F, p[2], p[3], true, true));
      case "spannear": {  // spannear <slop> <ordered:0|1> t1 t2 ...
        SpanQuery[] cl = new SpanQuery[p.length - 4];
        for (int i = 4; i < p.length; i++)
          cl[i - 4] = new SpanTermQuery(new Term(F, p[i]));
        return new SpanNearQuery(cl, Integer.parseInt(p[2]),
            p[3].equals("1"));
      }
      case "spanor": {
        SpanQuery[] cl = new SpanQuery[p.length - 2];
        for (int i = 2; i < p.length; i++)
          cl[i - 2] = new SpanTermQuery(new Term(F, p[i]));
        return new SpanOrQuery(cl);
      }
      case "spanfirst":  // spanfirst <end> t
        return new SpanFirstQuery(
            new SpanTermQuery(new Term(F, p[3])), Integer.parseInt(p[2]));
      case "iordered": {  // iordered t1 t2 ...
        IntervalsSource[] ss = new IntervalsSource[p.length - 2];
        for (int i = 2; i < p.length; i++) ss[i - 2] = Intervals.term(p[i]);
        return new IntervalQuery(F, Intervals.ordered(ss));
      }
      case "iunordered": {
        IntervalsSource[] ss = new IntervalsSource[p.length - 2];
        for (int i = 2; i < p.length; i++) ss[i - 2] = Intervals.term(p[i]);
        return new IntervalQuery(F, Intervals.unordered(ss));
      }
      case "imaxgaps": {  // imaxgaps <g> t1 t2...
        IntervalsSource[] ss = new IntervalsSource[p.length - 3];
        for (int i = 3; i < p.length; i++) ss[i - 3] = Intervals.term(p[i]);
        return new IntervalQuery(F, Intervals.maxgaps(
            Integer.parseInt(p[2]), Intervals.unordered(ss)));
      }
      default:
        throw new IllegalArgumentException(p[1]);
    }
  }

  public static void main(String[] a) throws Exception {
    Path tmp = Files.createTempDirectory("lucene_golden_idx");
    Analyzer an = new StandardAnalyzer(CharArraySet.EMPTY_SET);
    IndexWriterConfig cfg = new IndexWriterConfig(an);
    cfg.setMergePolicy(new LogDocMergePolicy());
    try (Directory dir = FSDirectory.open(tmp)) {
      try (IndexWriter w = new IndexWriter(dir, cfg)) {
        BufferedReader r = new BufferedReader(new InputStreamReader(
            new FileInputStream(a[0]), StandardCharsets.UTF_8));
        String line;
        while ((line = r.readLine()) != null) {
          int t = line.indexOf('\t');
          Document d = new Document();
          d.add(new StoredField("id", Integer.parseInt(line.substring(0, t))));
          FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
          ft.setIndexOptions(IndexOptions.DOCS_AND_FREQS_AND_POSITIONS);
          d.add(new Field(F, line.substring(t + 1), ft));
          w.addDocument(d);
        }
        w.forceMerge(1);
        w.commit();
      }
      try (IndexReader rd = DirectoryReader.open(dir)) {
        IndexSearcher s = new IndexSearcher(rd);
        BufferedReader qr = new BufferedReader(new InputStreamReader(
            new FileInputStream(a[1]), StandardCharsets.UTF_8));
        PrintWriter out = new PrintWriter(new OutputStreamWriter(
            new FileOutputStream(a[2]), StandardCharsets.UTF_8));
        String line;
        while ((line = qr.readLine()) != null) {
          if (line.isEmpty()) continue;
          String[] p = line.split("\t");
          Query q;
          if (p[1].equals("simterm")) {
            s.setSimilarity(sim(p[2]));
            q = new TermQuery(new Term(F, p[3]));
          } else {
            s.setSimilarity(new BM25Similarity());
            q = parse(p);
          }
          TopDocs td = s.search(q, 10);
          StringBuilder sb = new StringBuilder(p[0]);
          sb.append('\t').append(td.totalHits.value);
          for (ScoreDoc sd : td.scoreDocs) {
            int id = rd.document(sd.doc).getField("id").numericValue().intValue();
            sb.append('\t').append(id).append(':')
              .append(Float.floatToRawIntBits(sd.score));
          }
          out.println(sb);
        }
        out.flush(); out.close();
      }
    } finally {
      try (var walk = Files.walk(tmp)) {
        walk.sorted(Comparator.reverseOrder()).forEach(f -> f.toFile().delete());
      }
    }
  }
}
"""

# the reference query set: one line per query, engine twin in
# tests/test_lucene_differential.py parses the same lines
QUERIES = """\
q01\tterm\tspark
q02\tterm\tmerge
q03\tterm\tcustomer
q04\tterm\tthe
q05\tterm\twindow
q06\tterm\tspark\t2.5
q07\tand\tspark\tmerge
q08\tand\tspark\tmerge\tscan
q09\tand\tthe\twindow\tjoin\tsort
q10\tor\t0\tspark\tmerge
q11\tor\t0\tspark\tmerge\tscan
q12\tor\t2\tspark\tmerge\tscan
q13\tor\t3\tspark\tmerge\tscan\tjoin\tfilter
q14\treqopt\tspark\tmerge
q15\treqopt\tcustomer\twindow
q16\tnot\tspark\tmerge
q17\tnot\twindow\tthe
q18\tphrase\t0\tkey\torder
q19\tphrase\t0\ttable\tscan
q20\tphrase\t1\tkey\torder
q21\tphrase\t2\tmerge\tscan
q22\tphrase\t3\tspark\twindow
q23\tphrase\t0\tbatch\tbatch
q24\tphrase\t2\tbatch\tbatch
q25\tphrase\t3\tthe\tfast\tkey
q26\tdismax\t0.0\tspark\tmerge
q27\tdismax\t0.3\tspark\tmerge\tscan
q28\tdismax\t1.0\tcustomer\twindow
q29\tsynonym\tspark\tmerge
q30\tsynonym\tfast\tslow\tbig
q31\tprefix\tsc
q32\tprefix\tw
q33\twildcard\ts*k
q34\twildcard\t?can
q35\tfuzzy\t1\tmerge
q36\tfuzzy\t2\tmrge
q37\tfuzzy\t1\tscann
q38\trange\tmerge\tscan
q39\trange\ta\tcustomer
q40\tand\tcustomer\tline\tvalue
q41\tor\t0\tthe\ta
q42\tphrase\t1\tsort\ttable\tscan
q43\tphrase\t0\tfast\tkey\torder\tsort
q44\treqopt\tjoin\tjoin
q45\tnot\tjoin\tjoin
q46\tphrase\t1\tmerge\tjoin
q47\tphrase\t2\tdata\ttable
q48\tphrase\t3\tmerge\tscan\tjoin
q49\tphrase\t4\tthe\tdata
q50\tphrase\t2\tthe\ta
q51\tphrase\t5\tkey\torder\tsort
q52\tphrase\t6\tspark\twindow
q53\tphrase\t2\tline\tline
q54\tphrase\t8\tcustomer\tvalue
q55\tphrase\t3\tgroup\tagg\tfilter
q56\tspannear\t3\t0\tspark\tmerge
q57\tspannear\t3\t1\tspark\tmerge
q58\tspannear\t5\t0\tkey\torder\tsort
q59\tspannear\t5\t1\tkey\torder\tsort
q60\tspannear\t2\t0\tthe\tdata
q61\tspannear\t8\t1\tcustomer\tvalue
q62\tspanor\tspark\tmerge\tscan
q63\tspanfirst\t5\tspark
q64\tspanfirst\t12\tcustomer
q65\tiordered\tspark\tmerge
q66\tiunordered\tspark\tmerge
q67\tiordered\tkey\torder\tsort
q68\tiunordered\tkey\torder\tsort
q69\timaxgaps\t2\tspark\tmerge
q70\timaxgaps\t4\tthe\tdata
q71\tsimterm\tclassic\tspark
q72\tsimterm\tlmd\tmerge
q73\tsimterm\tlmjm\tspark
q74\tsimterm\tdfr_inl2\tcustomer
q75\tsimterm\tboolean\tspark
q76\tsimterm\tdfi\twindow
q77\tsimterm\tib_ll\tmerge
q78\tsimterm\tax_f2log\tspark
q79\tsimterm\tindri\tmerge
q80\tsimterm\tmulti\tspark
q81\tsimterm\tclassic\tthe
q82\tsimterm\tlmd\tthe
q83\tgapphrase\t0\t0:key\t2:sort
q84\tgapphrase\t2\t0:key\t2:sort
q85\tgapphrase\t3\t0:the\t3:order
q86\tgapphrase\t1\t0:merge\t1:scan\t3:join
q87\tmultiphrase\tkey|table\torder
q88\tmultiphrase\tspark|merge\tscan|join
q89\tnested\tspark\tmerge\tscan
q90\tnested\tcustomer\tthe\ta
q91\tcommon\t0.78\tthe\tspark
q92\tcommon\t0.5\tspark\tmerge
q93\tcommon\t0.9\tspark\tmerge\tscan
q94\tfilterq\tspark\tmerge
q95\tfilterq\tcustomer\tthe
q96\tfilteror\tspark\tmerge\tscan
q97\tspannear\t3\t0\tthe\tthe
q98\tspannear\t3\t1\tthe\tthe
q99\tspannear\t4\t0\tspark\tmerge\tspark
q100\tspannear\t5\t1\tspark\tmerge\tspark
q101\tiordered\tthe\tthe
q102\tiordered\tthe\tthe\tmerge
q103\tiunordered\tthe\tthe\tmerge
q104\tiordered\tspark\tmerge\tspark
q105\tphrase\t2\tthe\tthe
q106\tphrase\t3\tspark\tspark
q107\tphrase\t3\tthe\tspark\tthe
q108\tphrase\t4\tspark\tthe\tthe
q109\tmpslop\t3\tspark|merge\tmerge
q110\tmpslop\t2\tkey|order\torder|table
q111\tmpslop\t4\tthe|spark\tthe
q112\tmpslop\t5\tspark|merge\tmerge|scan\tscan
q113\tmpslop\t3\tspark|scan\tmerge|key
q114\tmpslop\t4\tspark\tspark\tmerge|scan
"""


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    build = tempfile.mkdtemp(prefix="lucene_golden_")
    try:
        core = os.path.join(build, "core")
        os.makedirs(core)
        srcs = []
        for root, _, files in os.walk(CORE_SRC):
            srcs += [os.path.join(root, f) for f in files
                     if f.endswith(".java") and f != "module-info.java"]
        lst = os.path.join(build, "srcs.txt")
        with open(lst, "w") as f:
            f.write("\n".join(srcs))
        qsrcs = []
        for root, _, files in os.walk(
                "/root/reference/lucene/queries/src/java"):
            qsrcs += [os.path.join(root, f) for f in files
                      if f.endswith(".java") and f != "module-info.java"]
        qlst = os.path.join(build, "qsrcs.txt")
        with open(qlst, "w") as f:
            f.write("\n".join(qsrcs))
        java_home = os.environ.get("JAVA_HOME", "")
        subprocess.run([os.path.join(java_home, "bin", "javac"), "-nowarn",
                        "-d", core, "-encoding", "UTF-8", "@" + lst],
                       check=True)
        subprocess.run([os.path.join(java_home, "bin", "javac"), "-nowarn",
                        "-cp", core, "-d", core, "-encoding", "UTF-8",
                        "@" + qlst], check=True)
        main_src = os.path.join(build, "LuceneGoldenMain.java")
        with open(main_src, "w") as f:
            # Operations lives in util.automaton
            f.write(MAIN_JAVA.replace(
                "import org.apache.lucene.store.*;",
                "import org.apache.lucene.store.*;\n"
                "import org.apache.lucene.util.automaton.Operations;"))
        subprocess.run([os.path.join(java_home, "bin", "javac"), "-cp", core,
                        "-d", build, main_src], check=True)

        # corpus: the sf0.001 documents fixture
        import duckdb
        rows = duckdb.connect().execute(
            "SELECT doc_id, text FROM "
            "'/root/testdata/sf0.001/documents.parquet' ORDER BY doc_id"
        ).fetchall()
        corpus = os.path.join(build, "corpus.tsv")
        with open(corpus, "w", encoding="utf-8") as f:
            for did, text in rows:
                f.write(f"{did}\t{(text or '').replace(chr(9), ' ').replace(chr(10), ' ')}\n")
        queries = os.path.join(GOLDEN_DIR, "queries.tsv")
        with open(queries, "w", encoding="utf-8") as f:
            f.write(QUERIES)
        out = os.path.join(GOLDEN_DIR, "golden.tsv")
        subprocess.run([os.path.join(java_home, "bin", "java"), "-cp",
                        build + ":" + core
                        + ":/root/reference/lucene/core/src/resources",
                        "LuceneGoldenMain",
                        corpus, queries, out], check=True)
        n = sum(1 for _ in open(out))
        print(f"wrote {n} query goldens -> {out}")
    finally:
        shutil.rmtree(build, ignore_errors=True)


if __name__ == "__main__":
    main()
