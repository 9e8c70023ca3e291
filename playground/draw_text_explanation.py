"""Render a run_text_explanation JSON result as an HTML heatmap
(parity: /root/reference/playground/draw_text_explanation.py, without the
bs4 dependency — plain string templating).

Run: python playground/draw_text_explanation.py results.json out.html
"""

from __future__ import annotations

import html
import json
import pathlib
import sys


def _mix(cl, cr, r: float):
    return tuple(int(cl[i] * r + cr[i] * (1 - r)) for i in range(3))


def color_for(value: float, limit: float):
    cl_begin = (18, 132, 255)   # negative attribution
    cl_mid = (224, 224, 224)
    cl_end = (237, 127, 127)    # positive attribution
    if value < -limit:
        return cl_begin
    if value < 0:
        return _mix(cl_begin, cl_mid, -value / limit)
    if value < limit:
        return _mix(cl_mid, cl_end, 1.0 - value / limit)
    return cl_end


def render(results: dict) -> str:
    blocks = []
    for idx, pairs in results.get("items", {}).items():
        attrs = [a for _, a in pairs] or [0.0]
        limit = max(abs(min(attrs)), abs(max(attrs))) or 1.0
        spans = []
        for token, value in pairs:
            r, g, b = color_for(value, limit)
            spans.append(
                f'<span style="background: rgb({r},{g},{b}); '
                f'padding: 1px 0;" title="{value:+.5f}">'
                f"{html.escape(token)}</span>"
            )
        blocks.append(
            f'<div class="sample"><div class="tag"># {idx}</div>'
            f'<p>{"".join(spans)}</p></div>'
        )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<style>body{font-family:sans-serif;max-width:48rem;margin:2rem auto;}"
        ".sample{margin-bottom:1.5rem;} .tag{color:#888;font-size:.8rem;}"
        "p{line-height:1.7;}</style></head><body>"
        "<h1>Shapley text explanations</h1>"
        + "".join(blocks)
        + "</body></html>"
    )


def main(src: str, dst: str) -> None:
    results = json.loads(pathlib.Path(src).read_text())
    pathlib.Path(dst).write_text(render(results))
    print(f"wrote {dst}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(
            "usage: python playground/draw_text_explanation.py src.json out.html"
        )
    main(sys.argv[1], sys.argv[2])
