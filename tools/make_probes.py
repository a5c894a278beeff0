#!/usr/bin/env python3
"""Build every probe replica of a testdata dir (driver-side tooling).

Each probe copies the source dir and perturbs it along ONE failure axis
(the COMBINED probe composes the two NULL axes). Axes and their catches
are documented in .claude/skills/verify/SKILL.md; the gate for every
replica is the same:

    sbt -batch "runMain graft.Verify <replica> /tmp/out"
    python3 tools/local_verify.py <replica> /tmp/out   # expect "81 pass, 0 fail"

Usage:  python3 tools/make_probes.py [src_dir] [dst_root] [axis ...]
        default: /root/testdata/sf0.01 /tmp all axes
Axes:   null tsnull combined empty tiny shuffled unicode dup extreme
        json vec tpchnull   (the full list is AXES at the bottom)

All rewrites preserve the source arrow schema (round-tripping through
another engine changes physical types and breaks the Tables readers —
that would be a probe artifact, not a product bug).
"""
import os
import random
import shutil
import sys
import datetime

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def copy_all(src, dst):
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")


def rewrite(dst, name, build):
    """Rewrite one table via build(table) -> dict of replaced columns."""
    path = f"{dst}/{name}.parquet"
    t = pq.read_table(path)
    repl = build(t)
    cols = {n: repl.get(n, t.column(n)) for n in t.schema.names}
    out = pa.table({n: (pa.array(v, type=t.schema.field(n).type)
                        if not isinstance(v, (pa.Array, pa.ChunkedArray)) else v)
                    for n, v in cols.items()}, schema=t.schema)
    pq.write_table(out, path)


def null_where(t, col, key, mod, rem):
    ids = t.column(key).to_pylist()
    vals = t.column(col).to_pylist()
    return [None if (d is not None and d % mod == rem) else v
            for d, v in zip(ids, vals)]


def probe_null(src, dst):
    """Column-NULL axis: every events/documents column except ts."""
    copy_all(src, dst)
    rewrite(dst, "events", lambda t: {
        "value": null_where(t, "value", "event_id", 10, 3),
        "user_id": null_where(t, "user_id", "event_id", 7, 2),
        "props": null_where(t, "props", "event_id", 11, 5),
        "event_type": null_where(t, "event_type", "event_id", 13, 4)})
    rewrite(dst, "documents", lambda t: {
        "text": null_where(t, "text", "doc_id", 10, 3),
        "lang": null_where(t, "lang", "doc_id", 7, 2),
        "source": null_where(t, "source", "doc_id", 11, 5)})


def probe_tsnull(src, dst):
    """ts-NULL axis: NULL timestamps hit the time-ordered operators."""
    copy_all(src, dst)
    rewrite(dst, "events", lambda t: {
        "ts": null_where(t, "ts", "event_id", 17, 6)})


def probe_combined(src, dst):
    probe_null(src, dst)
    rewrite(dst, "events", lambda t: {
        "ts": null_where(t, "ts", "event_id", 17, 6)})


def probe_empty(src, dst):
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t.slice(0, 0), f"{dst}/{name}.parquet")


def probe_tiny(src, dst):
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t.slice(0, 3), f"{dst}/{name}.parquet")


def probe_shuffled(src, dst):
    os.makedirs(dst, exist_ok=True)
    rng = random.Random(42)
    for name in TABLES:
        t = pq.read_table(f"{src}/{name}.parquet")
        idx = list(range(t.num_rows))
        rng.shuffle(idx)
        pq.write_table(t.take(idx), f"{dst}/{name}.parquet")


UNICODE_PAY = [
    "日本語のテキスト 分散処理 高速 データ",
    "👩🏽‍💻🚀🔥 data 📊 emoji stream",
    "café résumé naïve coöperate",
    "مرحبا بالعالم شلوم عولم نص عربي",
    "שלום עולם טקסט עברי",
    "zero​width‍joined‌tokens",
    "İstanbul ığüşöç DİYARBAKIR ẞharp",
    "𝕸𝖆𝖙𝖍 𝒰𝓃𝒾𝒸ℴ𝒹ℯ 𓀀𓀁 𐍈𐍉",
    "ΟΔΥΣΣΕΥΣ ΘΑΛΑΣΣΑ Σ ΣΟΦΙΑΣ τέλος",
    # İ-initial stopword shapes + dotted-I lorem-ipsum: exercise the
    # fold at the COMPARISON sites (stopword scoring, lang-id, contains)
    "İt İs the İn İT LOREM İPSUM",
]


def probe_unicode(src, dst):
    copy_all(src, dst)

    def docs(t):
        ids = t.column("doc_id").to_pylist()
        text = t.column("text").to_pylist()
        srcs = t.column("source").to_pylist()
        for i, d in enumerate(ids):
            if d % 19 == 11:
                p = UNICODE_PAY[d % len(UNICODE_PAY)]
                if d % 3 == 0 or text[i] is None:
                    text[i] = p + " " + UNICODE_PAY[(d + 1) % len(UNICODE_PAY)]
                else:
                    text[i] = (p + " " + text[i] + " "
                               + UNICODE_PAY[(d + 3) % len(UNICODE_PAY)])
            if d % 29 == 13 and srcs[i] is not None:
                srcs[i] = f"srç-ünï{d % 3}"
        return {"text": text, "source": srcs,
                "n_chars": [len(x) if x is not None else None for x in text]}

    def events(t):
        ids = t.column("event_id").to_pylist()
        props = t.column("props").to_pylist()
        for i, d in enumerate(ids):
            if d % 23 == 9 and props[i] is not None:
                if d % 2 == 0:
                    props[i] = '{"k": %d, "note": "αβγ 🚀 日本語 ت"}' % (d % 100)
                else:
                    props[i] = ('{"k": %d, "note": "\\u00e9\\ud83d\\ude00 esc"}'
                                % (d % 100))
        return {"props": props}

    rewrite(dst, "documents", docs)
    rewrite(dst, "events", events)


def probe_dup(src, dst):
    """Byte-identical duplicate rows: the at-least-once delivery model."""
    copy_all(src, dst)

    def dup(name, key, mod=31, rem=17):
        t = pq.read_table(f"{dst}/{name}.parquet")
        ids = t.column(key).to_pylist()
        mask = pa.array([x is not None and x % mod == rem for x in ids])
        pq.write_table(pa.concat_tables([t, t.filter(mask)]),
                       f"{dst}/{name}.parquet")

    dup("events", "event_id")
    dup("documents", "doc_id")
    dup("embeddings", "vec_id")
    dup("orders", "o_orderkey")
    dup("lineitem", "l_orderkey")
    # a TRIPLE-duplicated slice catches "exactly two" assumptions
    t = pq.read_table(f"{dst}/events.parquet")
    base = pq.read_table(f"{src}/events.parquet")
    ids = base.column("event_id").to_pylist()
    tri = base.filter(pa.array([x is not None and x % 101 == 53 for x in ids]))
    pq.write_table(pa.concat_tables([t, tri, tri]), f"{dst}/events.parquet")


def probe_extreme(src, dst):
    copy_all(src, dst)

    def events(t):
        ids = t.column("event_id").to_pylist()
        val = t.column("value").to_pylist()
        ts = t.column("ts").to_pylist()
        for i, d in enumerate(ids):
            if d % 37 == 5:
                val[i] = float("nan")
            elif d % 41 == 7:
                val[i] = float("inf")
            elif d % 43 == 11:
                val[i] = float("-inf")
            elif d % 47 == 13:
                val[i] = -1.7e308
            if d % 61 == 29 and ts[i] is not None:
                ts[i] = datetime.datetime(1970, 1, 1, 0, 0, 1, 500000)
        return {"value": val, "ts": ts}

    def docs(t):
        ids = t.column("doc_id").to_pylist()
        text = t.column("text").to_pylist()
        for i, d in enumerate(ids):
            if d % 53 == 19:
                text[i] = ""
            elif d % 59 == 23:
                text[i] = "   \t  "
            elif d % 67 == 31:
                text[i] = "x" * 10000
        return {"text": text,
                "n_chars": [len(x) if x is not None else None for x in text]}

    rewrite(dst, "events", events)
    rewrite(dst, "documents", docs)


def probe_vec(src, dst):
    """Corrupt embeddings: NaN element, NULL element, empty, truncated,
    all-zero — the valid-vector contract must drop all but the zero one —
    plus NULL labels (vote/grouping metadata, untouched by the NULL axis)."""
    copy_all(src, dst)

    def emb(t):
        ids = t.column("vec_id").to_pylist()
        e = t.column("embedding").to_pylist()
        lab = t.column("label").to_pylist()
        for i, d in enumerate(ids):
            if d % 31 == 27:
                lab[i] = None
            if e[i] is None:
                continue
            if d % 13 == 4:
                e[i] = [float("nan")] + e[i][1:]
            elif d % 17 == 8:
                e[i] = []
            elif d % 19 == 12:
                e[i] = e[i][:len(e[i]) // 2]
            elif d % 23 == 15:
                e[i] = [0.0] * len(e[i])
            elif d % 29 == 21:
                e[i] = e[i][:-1] + [None]
        return {"embedding": e, "label": lab}

    rewrite(dst, "embeddings", emb)


JSON_FORMS = ['not json', '{"k": }', '{"k": 5', '', '[1, 2', '{"K": 3}',
              '{}', '{"k": null}']


def probe_json(src, dst):
    copy_all(src, dst)

    def events(t):
        ids = t.column("event_id").to_pylist()
        props = t.column("props").to_pylist()
        for i, d in enumerate(ids):
            if d % 73 == 37 and props[i] is not None:
                props[i] = JSON_FORMS[d % len(JSON_FORMS)]
        return {"props": props}

    rewrite(dst, "events", events)


def probe_tpchnull(src, dst):
    """NULLs across the relational tables (group keys, join keys, measures,
    dates) — the column-NULL axis only ever touched events/documents."""
    copy_all(src, dst)

    def nullify(name, key, cols_mods):
        t = pq.read_table(f"{src}/{name}.parquet")
        ids = t.column(key).to_pylist()
        repl = {}
        for colname, (mod, rem) in cols_mods.items():
            vals = t.column(colname).to_pylist()
            repl[colname] = [None if (d is not None and d % mod == rem) else v
                             for d, v in zip(ids, vals)]
        cols = {n: (pa.array(repl[n], type=t.schema.field(n).type)
                    if n in repl else t.column(n)) for n in t.schema.names}
        pq.write_table(pa.table(cols, schema=t.schema), f"{dst}/{name}.parquet")

    nullify("lineitem", "l_orderkey", {
        "l_returnflag": (10, 3), "l_linestatus": (13, 4), "l_quantity": (7, 2),
        "l_discount": (11, 5), "l_extendedprice": (17, 9), "l_shipdate": (19, 11)})
    nullify("orders", "o_orderkey", {
        "o_orderdate": (13, 4), "o_custkey": (7, 2), "o_totalprice": (11, 5)})
    nullify("customer", "c_custkey", {
        "c_mktsegment": (7, 3), "c_nationkey": (11, 6), "c_acctbal": (13, 8)})


def probe_boiler(src, dst):
    """Adversarial near-dup corpus (r12, the thirteenth axis): 30% of
    documents share ONE boilerplate template (identical long body, tiny
    per-doc suffix) and 5% are byte-identical copies of one banner —
    the degenerate key distribution that turns an uncapped LSH band join
    quadratic: every template doc shares every template band key, so a
    naive self-join emits C(0.3N, 2) pairs. The engine's hot-bucket caps
    (kn <= MaxBucket keep-first) and kn >= 2 prefilters must keep the
    candidate set bounded AND the oracle gate green (the SQL oracles are
    text-agnostic, so any divergence is an engine artifact). The
    pair-count bound itself is pinned in-suite by SignatureLawsSpec's
    adversarial-corpus test; this replica proves the full 107-query gate
    survives the same distribution end-to-end."""
    copy_all(src, dst)

    boiler = ("release checklist all systems nominal heartbeat check "
              "completed status green no anomalies detected in the last "
              "collection window escalation not required on call rotation "
              "unchanged dashboards quiet deploy freeze lifted ") * 3
    clone = ("identical boilerplate banner line repeated verbatim across "
             "the whole fleet every shard every zone")

    def docs(t):
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out = []
        for d, txt in zip(ids, texts):
            if d is not None and d % 20 == 7:        # 5% byte-identical
                out.append(clone)
            elif d is not None and d % 10 < 3:       # 30% one template
                out.append(f"{boiler}unit {d} of fleet {d % 7}")
            else:
                out.append(txt)
        return {"text": out,
                "n_chars": [None if x is None else len(x) for x in out]}

    rewrite(dst, "documents", docs)


AXES = {
    "null": probe_null, "tsnull": probe_tsnull, "combined": probe_combined,
    "empty": probe_empty, "tiny": probe_tiny, "shuffled": probe_shuffled,
    "unicode": probe_unicode, "dup": probe_dup, "extreme": probe_extreme,
    "json": probe_json, "vec": probe_vec, "tpchnull": probe_tpchnull,
    "boiler": probe_boiler,
}


def main():
    args = sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    root = args[1] if len(args) > 1 else "/tmp"
    axes = args[2:] if len(args) > 2 else list(AXES)
    unknown = [a for a in axes if a not in AXES]
    if unknown:
        sys.exit(f"unknown axes {unknown}; valid: {' '.join(AXES)}")
    for ax in axes:
        dst = f"{root}/probe_{ax}"
        AXES[ax](src, dst)
        print(f"built {dst}")


if __name__ == "__main__":
    main()
