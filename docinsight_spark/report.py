"""Report rendering: JSON + standalone HTML pair.

The reference writes both a JSON report and a generated HTML page per
analysis (``/root/reference/enhanced_pipeline.py:649-721``,
``generate_report_files`` / ``_generate_html_report``).  The engine's
analog renders the collected originality roll-up and top risk spans —
already tiny driver-side rows — into a self-contained HTML document
(no external assets), so ``cmd_report`` emits the same JSON+HTML pair.
"""

from __future__ import annotations

import html


def _risk_color(score: float) -> str:
    if score >= 0.8:
        return "#1a7f37"  # high originality → green
    if score >= 0.5:
        return "#b58900"
    return "#b42318"


def render_html(report: dict) -> str:
    """Standalone HTML for a report dict shaped like cmd_report's JSON:
    ``{"n_documents", "originality": [...], "top_risk_spans": [...]}``."""
    orig = report.get("originality", [])
    spans = report.get("top_risk_spans", [])
    rows = []
    for r in sorted(orig, key=lambda x: x.get("originality_score", 0.0)):
        s = float(r.get("originality_score", 0.0))
        rows.append(
            "<tr>"
            f"<td>{html.escape(str(r.get('doc_id', '')))}</td>"
            f"<td style='color:{_risk_color(s)};font-weight:600'>{s:.4f}</td>"
            f"<td>{float(r.get('plagiarized_coverage', 0.0)):.4f}</td>"
            f"<td>{float(r.get('severity_index', 0.0)):.4f}</td>"
            f"<td>{int(r.get('total_sentences', 0))}</td>"
            f"<td>{int(r.get('n_high', 0))}</td>"
            f"<td>{int(r.get('n_medium', 0))}</td>"
            "</tr>"
        )
    span_rows = []
    for sp in spans:
        span_rows.append(
            "<tr>"
            f"<td>{html.escape(str(sp.get('doc_id', '')))}</td>"
            f"<td>{html.escape(str(sp.get('risk_level', '')))}</td>"
            f"<td>{int(sp.get('start_index', 0))}–{int(sp.get('end_index', 0))}</td>"
            f"<td>{float(sp.get('avg_score', 0.0)):.4f}</td>"
            f"<td>{int(sp.get('token_count', 0))}</td>"
            "</tr>"
        )
    ev = report.get("evidence", [])
    ev_rows = []
    for e in ev:
        start = e.get("match_snippet_start")
        snip = e.get("match_snippet_text") or ""
        ev_rows.append(
            "<tr>"
            f"<td>{html.escape(str(e.get('doc_id', '')))}</td>"
            f"<td>{int(e.get('idx', 0))}</td>"
            f"<td><code>{html.escape(str(e.get('sentence', ''))[:160])}</code></td>"
            f"<td>{html.escape(str(e.get('best_match', '')))}</td>"
            f"<td>{'' if start is None else int(start)}</td>"
            f"<td><code>{html.escape(str(snip)[:200])}</code></td>"
            "</tr>"
        )
    ev_html = ""
    if ev_rows:
        ev_html = f"""
<h2>Matched-sentence evidence</h2>
<table>
<tr><th>doc</th><th>line</th><th>query sentence</th><th>matched doc</th>
<th>offset</th><th>matched text (KWIC)</th></tr>
{''.join(ev_rows)}
</table>"""
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>DocInsight-Spark originality report</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 2rem; color: #1f2328; }}
 table {{ border-collapse: collapse; margin: 1rem 0; }}
 th, td {{ border: 1px solid #d0d7de; padding: .35rem .7rem; text-align: left; }}
 th {{ background: #f6f8fa; }}
 h1 {{ font-size: 1.4rem; }} h2 {{ font-size: 1.1rem; }}
</style></head><body>
<h1>Originality report</h1>
<p>{int(report.get("n_documents", len(orig)))} document(s) analyzed.</p>
<h2>Per-document originality</h2>
<table>
<tr><th>doc</th><th>originality</th><th>coverage</th><th>severity</th>
<th>sentences</th><th>high</th><th>medium</th></tr>
{''.join(rows) or '<tr><td colspan="7">no documents</td></tr>'}
</table>
<h2>Top risk spans</h2>
<table>
<tr><th>doc</th><th>risk</th><th>lines</th><th>avg score</th><th>tokens</th></tr>
{''.join(span_rows) or '<tr><td colspan="5">no risk spans</td></tr>'}
</table>{ev_html}
</body></html>
"""
