"""S5 — figure/reporting sink (reference plot_YAP.py:49-81, fig.savefig).

Engine-side the rule is: figures render from SMALL aggregates only — the
plan does the heavy lifting, the driver pulls a bounded result and renders.
matplotlib is optional in this environment, so rendering degrades to a
plot-spec JSON + CSV payload (same information, renderable anywhere); the
Spark-side contract (bounded collect of a finished aggregate) is identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

MAX_FIGURE_ROWS = 10_000


def _collect_small(df: DataFrame) -> "pandas.DataFrame":  # noqa: F821
    pdf = df.limit(MAX_FIGURE_ROWS + 1).toPandas()
    if len(pdf) > MAX_FIGURE_ROWS:
        raise ValueError(
            f"figure sink got >{MAX_FIGURE_ROWS} rows; aggregate before plotting "
            "(the reference plots describe()/groupBy outputs, never raw frames)"
        )
    return pdf


def save_figure(
    df: DataFrame,
    path: str,
    kind: str = "bar",
    x: str | None = None,
    y: str | None = None,
    title: str | None = None,
) -> str:
    """Render a small aggregate to ``path``.png, or to ``path``.json +
    ``path``.csv when matplotlib is unavailable. Returns the written path."""
    pdf = _collect_small(df)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        spec = {
            "kind": kind, "x": x, "y": y, "title": title,
            "columns": list(pdf.columns), "n_rows": len(pdf),
        }
        with open(path + ".json", "w") as f:
            json.dump(spec, f, indent=2)
        pdf.to_csv(path + ".csv", index=False)
        return path + ".json"

    fig, ax = plt.subplots(figsize=(8, 6))
    if kind == "bar":
        pdf.plot.bar(x=x, y=y, ax=ax, legend=False)
    elif kind == "hist":
        pdf.plot.hist(y=y, ax=ax, legend=False)
    else:
        pdf.plot.line(x=x, y=y, ax=ax, legend=False)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path + ".png")
    plt.close(fig)
    return path + ".png"
