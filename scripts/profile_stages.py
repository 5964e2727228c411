"""Per-stage time split of the per-document extraction kernel (round-2
verdict task #1): is the irreducibly-Python HTML/PDF parse the dominant
cost, or does the per-row Python spent on layout/selection/geometry/labeling
(which all HAVE verified pure-Column forms) leave real vectorization wins on
the table?

Method: re-run extract_document's exact stage sequence over the same
deterministic pages fixture the scaling runs use, single process (the doc
kernel is embarrassingly parallel — per-core shares equal the aggregate
split), accumulating perf_counter per stage. Prints one JSON line and a
markdown table for BENCH/BASELINE.md.

Stage map (extract_document, oracle/extractor.py):
  decode     decode_html                     E1 charset sniff + decode
  strip      strip_noncontent                E1 script/style/comment strip
  segment    segment_html / extract_pdf      E2 DOM walk → blocks  (the
                                             irreducible stdlib-parser part)
  geometry   layout+filter+select+render+    E2 Column-expressible part
             rule points+crop+padding
  slice      crop_text + char_span           H16
  label      extract_fields                  E3 Column-expressible part
  assemble   span/record dict assembly       plumbing
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_image_toolkit_spark.config import ExtractConfig  # noqa: E402
from py_image_toolkit_spark.fixtures import page_row  # noqa: E402
from py_image_toolkit_spark.kernels.normalize import (  # noqa: E402
    decode_html,
    strip_noncontent,
)
from py_image_toolkit_spark.kernels.segment import (  # noqa: E402
    PDF_MAGIC,
    extract_pdf_blocks,
    segment_html,
)
from py_image_toolkit_spark.oracle import geometry as G  # noqa: E402
from py_image_toolkit_spark.oracle.extractor import (  # noqa: E402
    char_span,
    crop_text,
    layout_blocks,
    render_lines,
    select_main,
)
from py_image_toolkit_spark.oracle.labeling import extract_fields  # noqa: E402


def profile(n_docs: int, seed: int = 42) -> dict[str, float]:
    cfg = ExtractConfig()
    t = defaultdict(float)
    pc = time.perf_counter

    docs = [page_row(i, seed) for i in range(n_docs)]  # untimed generation

    for row in docs:
        html = row["html"]
        html_b = bytes(html) if html is not None else None

        t0 = pc()
        dec = decode_html(html_b)
        t["decode"] += pc() - t0
        if not dec.success:
            continue

        if html_b is not None and html_b.startswith(PDF_MAGIC):
            t0 = pc()
            raw_blocks = extract_pdf_blocks(html_b)
            t["segment"] += pc() - t0
        else:
            t0 = pc()
            stripped = strip_noncontent(dec.text)
            t["strip"] += pc() - t0
            t0 = pc()
            raw_blocks = segment_html(stripped)
            t["segment"] += pc() - t0

        t0 = pc()
        laid, cw, ch = layout_blocks(raw_blocks, cfg.wrap_width, cfg.norm_mode)
        cands = [
            b for b in laid
            if b.max_w >= cfg.min_block_w
            and b.n_lines >= cfg.min_block_h
            and b.score >= cfg.min_score
        ]
        t["geometry"] += pc() - t0
        if not cands:
            continue
        t0 = pc()
        main = select_main(cands, cw, ch, cfg)
        ref_center = main.top_center if cfg.ref_point == "top" else main.bbox_center
        lines = render_lines(laid, cfg.wrap_width, cfg.norm_mode)
        ratio = G.parse_ratio(cfg.ratio)
        rects = []
        for rule in cfg.rules:
            points = G.rule_points(cw, ch, rule)
            rect = G.optimal_crop(cw, ch, ref_center, points, ratio)
            if rect is not None:
                rects.append(G.apply_padding(rect, cw, ch, cfg.padding_percent))
        t["geometry"] += pc() - t0

        for rect in rects:
            t0 = pc()
            text = crop_text(lines, rect)
            start, end = char_span(lines, rect)
            t["slice"] += pc() - t0
            t0 = pc()
            toks = text.split()
            fields = extract_fields(toks)
            t["label"] += pc() - t0
            t0 = pc()
            spans = [{"field": "main", "start": start, "end": end}]
            for f, v in fields.items():
                if v is None:
                    continue
                first_tok = v.split(" ")[0]
                posn = text.find(first_tok)
                if posn >= 0:
                    spans.append({"field": f, "start": posn, "end": posn + len(v)})
            t["assemble"] += pc() - t0
    return dict(t)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    t = profile(n)
    total = sum(t.values())
    parse = t.get("decode", 0) + t.get("strip", 0) + t.get("segment", 0)
    columnizable = t.get("geometry", 0) + t.get("slice", 0) + t.get("label", 0)
    report = {
        "n_docs": n,
        "total_s": round(total, 2),
        "docs_per_sec_1core": round(n / total, 1),
        "stages_s": {k: round(v, 2) for k, v in sorted(t.items())},
        "stages_pct": {k: round(100 * v / total, 1) for k, v in sorted(t.items())},
        "parse_pct": round(100 * parse / total, 1),
        "columnizable_pct": round(100 * columnizable / total, 1),
    }
    print(json.dumps(report))
    print("\n| stage | sec | % |")
    print("|---|---|---|")
    for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
        print(f"| {k} | {v:.2f} | {100 * v / total:.1f} |")
    print(f"| **total** | {total:.2f} | 100 |")
    print(
        f"\nparse (decode+strip+segment): {100 * parse / total:.1f}% — "
        f"Column-expressible (geometry+slice+label): {100 * columnizable / total:.1f}%"
    )


if __name__ == "__main__":
    main()
