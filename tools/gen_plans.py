import sys, io
sys.path.insert(0, "/root/repo")
from contextlib import redirect_stdout
from go_vectorsearch_spark import get_spark
from go_vectorsearch_spark import queries as R

# PLANS.md documents the DISTRIBUTED plans — the shapes a 100 TB corpus
# runs. The two fixpoint entries would otherwise take their adaptive
# driver-local path at this SF (r13), which has no plan to audit, so
# the gate's corpus probe is disabled for this tool only.
import go_vectorsearch_spark.operators.curation as _CUR

_CUR._bounded_local_rows = lambda *a, **k: None

sf = "/root/testdata/sf0.01"
spark = get_spark("plans")

PICKS = [
    ("cosine_topk", "Flagship brute-force cosine top-k: the literal query vector folds into "
     "whole-stage codegen (scoring is a narrow map); the only exchange is the T2 dedup groupBy's "
     "tiny (id, score) shuffle with map-side partial max; TakeOrderedAndProject replaces any "
     "global sort (partial top-k per partition + driver merge)."),
    ("events_asof_join", "As-of join via single-scan tag + running last_value window: ONE parquet "
     "scan (filter pushed), ONE hash-partition exchange on user_id. No range-join row explosion "
     "at any scale."),
    ("scan_projection", "Projection/filter pushdown: ReadSchema carries only the selected "
     "columns; PushedFilters carries the predicate into the parquet reader."),
    ("join_fk_filter", "FK join with pushed dimension filter: Catalyst broadcasts the small "
     "side on its own (no hint) and prunes both scans."),
    ("dedup_minhash_lsh", "MinHash+LSH: signatures are per-row expression folds over the "
     "persisted hashed-shingle frame (InMemoryTableScan); band bucket join + Jaccard verify "
     "shuffle only (band, id) keys and candidate pairs — raw text never moves."),
    ("ivf_partitioned_probe", "IVF probe through the on-disk partitionBy(centroid_id) store: "
     "the centroid_id IN (...) filter is a PartitionFilter — non-probed inverted lists are "
     "never read (the parquet analog of the reference's indexed FK scan)."),
    ("dedup_simhash_pairs", "SimHash near-dup pairs: band explode is a narrow projection; the "
     "band-bucket self-join shuffles only (band, key, id, sketch) ints; candidate dedup is the "
     "first-agreeing-band predicate on the joined sketches — no distinct() exchange of the "
     "pair stream."),
    ("range_join_shipments", "Range join (point-in-interval) via bucketed equi-join: intervals "
     "explode to the buckets they span, points join on their bucket, the exact predicate "
     "re-applies post-join — no BroadcastNestedLoopJoin row explosion at any scale."),
    ("pagination_orders", "Offset/limit pagination: native offset+limit over the sorted "
     "frame compiles to TakeOrdered-style partial top-(offset+count) per partition with a "
     "single merge — no row_number window, no single-partition exchange (the plan-lint "
     "forbids unpartitioned Windows repo-wide)."),
    ("ann_lsh_buckets", "LSH bucketing: the 16-bit sign-random-projection bucket is ONE "
     "nested fold over a flat plane Literal inside a single projection (no per-bit "
     "subtrees); the histogram is a partial+final hash aggregate over the narrow bucket "
     "column."),
    ("dedup_semantic", "Semantic dedup (SemDeDup): one hash-partition exchange on the "
     "cluster id feeding FlatMapGroupsInPandas — per-cluster chunked GEMM with task memory "
     "bounded by max_leaf; no corpus-squared similarity buffer anywhere. The windowed "
     "entry derives its cluster column (vec_id-hash bucket) so the DuckDB twin replays "
     "the greedy sequence; dedup_semantic_ivf composes the same operator with the IVF "
     "assignment (identical plan shape above the exchange)."),
    ("fulltext_bm25_stored", "BM25 probe over the stored term-hash-bucketed postings: the "
     "query terms' buckets arrive as PartitionFilters on _tb (constant-folded "
     "pmod(xxhash64(term)) literals — non-matching buckets never read, the inverted "
     "index's seek as directory pruning), the term IN-list pushes into surviving row "
     "groups on BOTH pruned scans (score side + the tiny per-term idf aggregate that "
     "broadcasts in), and the whole search is one job: idf exchange is terms-sized, the "
     "per-document score sum is the only data-bearing shuffle."),
    ("fulltext_maxsim", "Late-interaction MaxSim: every query vector is a literal codegen "
     "score column over ONE corpus scan; a single groupBy(doc) computes all per-query maxes "
     "map-side, so the lone exchange carries |docs| x nq partial aggregates regardless of "
     "query-set size."),
    ("ivf_search_filtered", "Filtered vector search: the scalar predicate composes with the "
     "probe's centroid_id IN (...) as a PRE-filter — on the stored layout the probe is a "
     "PartitionFilter and the predicate pushes into the surviving row groups, so the scan "
     "reads only matching rows of probed lists; top-k is TakeOrdered over the filtered "
     "candidates (always k matching rows when k exist)."),
    ("fulltext_hybrid_rrf", "Hybrid RRF fusion: the lexical and vector leg are BOUNDED "
     "top-n frames (each ends in its own TakeOrdered/limit), fused by ONE single-row "
     "aggregate over their leg-tagged union (one conditional collect_list per leg, r6: "
     "the per-leg aggregate stages merged) — rank assignment is a codegen'd indexed "
     "transform, no Window, so a corpus-sized frame can never serialize through one task "
     "(it would fail fast on the single-row aggregate); the fused groupBy shuffles at "
     "most 2n (id, rrf) rows."),
    ("cdc_dup_stats", "Content-defined chunking + dup stats: the chunker is a narrow "
     "Arrow-batched mapInPandas (no Exchange — text never shuffles) streaming straight "
     "into a chunk_hash-partitioned ownership WINDOW (whole-partition min/count, no "
     "ORDER BY — r13: the former owner-aggregate + tag-back join consumed the chunk "
     "frame twice and shuffled both the aggregate output and the chunk rows); the only "
     "exchanges are the window's chunk_hash partitioning and the doc_id stats groupBy, "
     "both over narrow (id, ix, len, md5) rows — exact-dedup's cost profile at chunk "
     "granularity, every chunk row moved exactly once."),
    ("bpe_encode_docs", "BPE encode with the learned merge table in the UDF closure: ONE "
     "narrow mapInPandas over the documents scan — zero exchanges; tokenizer training "
     "(histogram + driver merge loop) is the amortized build billed separately."),
    ("ngram_perplexity", "n-gram LM perplexity scoring: ONE narrow mapInPandas with the "
     "bounded model in the closure — zero exchanges on the candidate corpus; training's "
     "per-order gram groupBys are the amortized build billed separately."),
    ("token_budget_sample", "Token-budget sampling (resharded r12): one codegen'd projection "
     "for counts + addressing, then a TWO-LEVEL prefix sum — the hash order range-shards into "
     "contiguous (stratum, shard) runs, ONE exchange feeds both the local running-sum window "
     "and the shard-total aggregate (ReusedExchange in the final adaptive plan), broadcast "
     "offsets complete the prefix — so no stratum ever lands a corpus-scale single-task "
     "sort; then a left-semi join back. Raw text rides only the final semi-joined rows."),
    ("profile_documents_approx", "One-scan table profile (HLL-distinct scale mode): every "
     "per-column statistic is a mergeable aggregate in a single aggregate pair "
     "(partial+final, one Exchange of one row per partition); the long-format explode runs "
     "on the one aggregated row. The exact_distinct parity mode instead plans an Expand + "
     "per-column distinct shuffles — fine at validation scale, wrong at corpus scale."),
    ("ann_pca_rerank", "PCA-compressed ANN: the reduced-space cosine shortlist scans the "
     "16-wide projected column of the persisted frame (k/d of the full scan width) with "
     "the reduced query folded into codegen; TakeOrdered shortlist, then exact cosine "
     "re-rank of the <= k_results x mult shortlist rows only. Fit and projection are "
     "write-once per corpus (billed to pca_project_build), like the PQ codes."),
    ("dedup_exact_substr", "Exact-substring dedup over the SHARED persisted "
     "duplicate-flags frame (r9 — one 16-byte-key hash aggregate + join-back paid once "
     "for this entry AND substr_cut_docs; the windows themselves derive from THE corpus "
     "tokenize pass, r8): the per-document (partitioned) islands window pair and one "
     "(doc, island) aggregate over the flags. At 100 TB every shuffled row is (long, "
     "int, binary(16)); raw text never reaches an Exchange."),
    ("ann_pca_exact", "PCA exactness anchor (driver-checked r8): the SAME two-stage "
     "reduced-shortlist -> exact-rerank plan as ann_pca_rerank, at k = d uncentered "
     "with shortlist_mult = 1 — an orthogonal rotation preserves the cosine order, so "
     "the plan must reproduce brute-force top-k exactly (hash-checked against the "
     "cosine_topk oracle). Build billed to pca_exact_build."),
    ("dedup_jaccard_pairs", "n-gram Jaccard pairs (r8 restage): explode of the persisted "
     "hashed-shingle frame with the per-doc set size riding each row, one equi-self-join "
     "on the shingle hash, and Jaccard straight off the pair-count aggregate — no "
     "size-frame join-backs. Every shuffled row is ints; raw text never moves."),
    ("substr_cut_docs", "Keeper-protected exact-substring cut (windowed r8): the "
     "duplicate-flags frame (keeper = min struct per 16-byte window hash, SHARED with "
     "dedup_exact_substr's duplicate set since r9) feeds removable/keeper islands per "
     "document (partitioned windows); the token filter is merge-rank interval "
     "subtraction + gap slices (r9 — linear in document length, pure array "
     "expressions); raw text moves only in the final per-document rebuild projection."),
    ("ann_ivfpq_exact", "IVF-PQ exactness anchor (windowed r9): nprobe='all' + "
     "rerank='all' — identity probe filter (no all-centroid isin literal, no count "
     "job), sort-free exact re-rank of the whole coded store (ADC pass skipped: its "
     "order cannot affect a full re-rank). Proves the coded store and the rerank "
     "stage's conventions round-trip the corpus, hash-checked vs the cosine_topk "
     "oracle."),
    ("decontaminate_cut_docs", "Benchmark-decontamination cut (windowed r10): the "
     "benchmark split's distinct window hashes BROADCAST into a left-semi probe of "
     "the corpus-side window frame (the corpus never shuffles on window hash), "
     "per-document islands merge under partitioned windows, and the cut is the same "
     "linear merge-rank token filter as substr_cut_docs with an empty keeper set — "
     "raw text moves only in the final rebuild projection."),
    ("line_dedup_docs", "Corpus-level line/boilerplate dedup (windowed r11, CCNet "
     "§4.1): lines explode to (id, ix, 16-byte line-hash) rows; the hot set is a "
     "HAVING count>=min_df aggregate over DISTINCT (doc, hash) joining back as a "
     "FRAME (auto-broadcast while small, never a collected literal); the only "
     "text-bearing shuffle is the final per-document regroup."),
    ("boilerplate_cut_docs", "Line/boilerplate-cut FIXPOINT (windowed r12): each pass is the "
     "line_dedup shape (hot fit = HAVING aggregate over DISTINCT (doc, 16-byte hash), frame "
     "join, per-document regroup) plus a pure-expression storage normalization on CHANGED "
     "docs; the loop is a bounded driver check (tiny hot-frame isEmpty per pass, the k-means "
     "discipline), pass intermediates persist and release AS SUPERSEDED, and frozen "
     "empty-document markers leave the fit by an anti-join — never a collected literal."),
    ("pipeline_curate_docs", "END-TO-END curation composition (windowed r11): "
     "boilerplate-line strip -> keeper-protected substring fixpoint cut -> "
     "decontamination cut -> Jaccard near-dup dedup -> quality filter -> "
     "token-budget mix, chained over the same frame. Raw text reaches an Exchange "
     "only at the per-document rebuild points (line regroup, cut rebuilds); every "
     "other shuffle carries int/hash keys (window hashes, shingle ints, pair ids, "
     "budget-window rows) — each stage keeps its standalone plan shape under "
     "composition."),
]

out = []
out.append("# PLANS — flagship physical plans (generated; sf0.01)\n")
out.append("Regenerate with `python tools/gen_plans.py` (any sf). Each plan is the executed\n"
           "`explain('formatted')` of the registry query, BEFORE execution (initial AQE plan).\n")
for name, blurb in PICKS:
    # registry entry, or a demoted pytest-parity query (plain q_ function)
    fn = R.REGISTRY[name].fn if name in R.REGISTRY else getattr(R, f"q_{name}")
    df = fn(spark, sf)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # keep the tree + the scan/exchange/window node details, drop long column dumps
    lines = text.splitlines()
    keep = []
    in_tree = True
    for ln in lines:
        if ln.startswith("("):
            in_tree = False
        if in_tree:
            keep.append(ln)
        else:
            if ln.startswith("(") or ln.startswith("Location") or \
               ln.startswith("ReadSchema") or ln.startswith("PushedFilters") or \
               ln.startswith("PartitionFilters") or ln.startswith("Arguments: hashpartitioning") or \
               ln.startswith("Condition"):
                keep.append(ln)
    # cap each section: only the composed curation pipeline exceeds this
    # (6 chained stage plans); its stages' standalone shapes have their
    # own sections, so the head — the output aggregate down through the
    # budget window and the dedup joins — carries the composition story
    CAP = 250
    if len(keep) > CAP:
        keep = keep[:CAP] + [
            f"... ({len(keep) - CAP} more plan lines elided — chained "
            "stage subtrees whose standalone shapes appear in their own "
            "sections above)"
        ]
    out.append(f"\n## {name}\n\n{blurb}\n\n```\n" + "\n".join(keep).strip() + "\n```\n")
open("PLANS.md", "w").write("\n".join(out))
print("written", sum(len(o) for o in out), "chars")
spark.stop()
