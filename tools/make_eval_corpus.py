"""Build an on-disk retrieval-eval dataset in the reference's format:
corpus.parquet ({corpus-id, text, image{bytes}}), queries.parquet
({query-id, query}), qrels.tsv — seeded with the reference's example pages
(/root/reference/examples/training_data) plus text-rendered synthetic pages,
for driving driver/eval_retriever.py end-to-end on the chip (SURVEY §3.2
hardware proof; quality numbers need pretrained weights this environment
cannot download — the run validates protocol + wall-clock).

    python tools/make_eval_corpus.py --out /tmp/eval_data --pages 32
"""

import argparse
import io
import os


def _render_page(text: str, seed: int):
    from PIL import Image, ImageDraw
    import numpy as np
    rng = np.random.default_rng(seed)
    w, h = 620, 877          # ~A4 at 72 dpi
    img = Image.new("RGB", (w, h), "white")
    d = ImageDraw.Draw(img)
    y = 40
    d.text((40, y), text, fill="black")
    for i in range(18):      # filler paragraphs
        y += 42
        words = " ".join(f"w{rng.integers(0, 999)}" for _ in range(9))
        d.text((40, y), words, fill=(40, 40, 40))
    return img


def main(argv=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--pages", type=int, default=32)
    ap.add_argument("--ref", default="/root/reference/examples/training_data")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    rows = []
    queries = []
    # seed with the reference example rows (real document pages + queries)
    if os.path.isdir(args.ref):
        ref_tbl = pq.read_table(os.path.join(args.ref, "0.parquet"))
        for i, r in enumerate(ref_tbl.to_pylist()):
            did = f"ref{i}"
            rows.append({"corpus-id": did, "text": "",
                         "image": {"bytes": r["image"]["bytes"]}})
            queries.append({"query-id": f"q_{did}", "query": r["query"],
                            "docid": did})
    topics = ["solar panel efficiency", "jazz history timeline",
              "volcano eruption chart", "railway freight statistics",
              "protein folding diagram", "medieval trade routes",
              "smartphone battery tests", "coral reef bleaching",
              "wheat price index", "submarine cable map"]
    for i in range(args.pages - len(rows)):
        topic = topics[i % len(topics)]
        title = f"Report {i}: {topic} (volume {i // len(topics) + 1})"
        img = _render_page(title, seed=i)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        did = f"d{i}"
        rows.append({"corpus-id": did, "text": "",
                     "image": {"bytes": buf.getvalue()}})
        queries.append({"query-id": f"q_{did}",
                        "query": f"what does report {i} say about {topic}?",
                        "docid": did})

    pq.write_table(pa.Table.from_pylist(
        [{k: r[k] for k in ("corpus-id", "text", "image")} for r in rows]),
        os.path.join(args.out, "corpus.parquet"))
    pq.write_table(pa.Table.from_pylist(
        [{"query-id": q["query-id"], "query": q["query"]} for q in queries]),
        os.path.join(args.out, "queries.parquet"))
    with open(os.path.join(args.out, "qrels.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for q in queries:
            f.write(f"{q['query-id']}\t{q['docid']}\t1\n")
    print(f"{len(rows)} pages, {len(queries)} queries -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
