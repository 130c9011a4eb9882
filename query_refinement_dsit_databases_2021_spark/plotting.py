"""Result-plot sink (SURVEY §2.1 K1).

The reference renders the series line, result points, and one box per
result window to a PNG (reference:src/server.py:901-952, saved at
:82-86). Here the plot DATA is assembled Spark-side with a bounded
collect (series segment capped at ``max_points``; results are already
<= k), then rendered with matplotlib when available. This container
has no matplotlib, so the fallback sink writes the same content as a
JSON plot spec — every element the reference draws, in data form.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - matplotlib absent in this environment
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except ImportError:
    HAVE_MPL = False

MAX_POINTS = 200_000


def plot_spec(
    series: DataFrame,
    results: DataFrame,
    ylabel: str,
    max_points: int = MAX_POINTS,
) -> dict:
    """Assemble the reference plot's elements: the series segment
    spanning all result windows (plus margin), one (x, y) marker per
    result start, and one [x, x+lx] box per result."""
    res = [
        (int(r["time_id"]), int(r["offset"]))
        for r in results.select("time_id", "offset").collect()
    ]
    if res:
        lo = min(x for x, _ in res)
        hi = max(x + lx for x, lx in res)
        margin = max(10, (hi - lo) // 10)
        seg = series.where(F.col("time_id").between(lo - margin, hi + margin))
    else:
        seg = series
    pts = [
        (int(r["time_id"]), float(r["y"]))
        for r in seg.limit(max_points).collect()
    ]
    y_by_t = dict(pts)
    return {
        "ylabel": ylabel,
        "series": pts,
        "result_points": [(x, y_by_t.get(x)) for x, _ in res],
        "windows": [
            {"x0": x, "x1": x + lx, "length": lx} for x, lx in res
        ],
    }


def save_plot(
    series: DataFrame,
    results: DataFrame,
    ylabel: str,
    out_path: str,
    max_points: int = MAX_POINTS,
) -> str:
    """Render the result plot to ``out_path``. With matplotlib: a PNG
    like the reference's (line + markers + window spans). Without: the
    plot spec as JSON next to the requested path."""
    spec = plot_spec(series, results, ylabel, max_points)
    if HAVE_MPL:  # pragma: no cover - not installed here
        fig, ax = plt.subplots(figsize=(12, 5))
        xs = [p[0] for p in spec["series"]]
        ys = [p[1] for p in spec["series"]]
        ax.plot(xs, ys, lw=0.7, label=ylabel)
        for w in spec["windows"]:
            ax.axvspan(w["x0"], w["x1"], alpha=0.2, color="orange")
        rp = [p for p in spec["result_points"] if p[1] is not None]
        if rp:
            ax.scatter([p[0] for p in rp], [p[1] for p in rp], c="red", zorder=3)
        ax.set_xlabel("time_id")
        ax.set_ylabel(spec["ylabel"])
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
        return out_path
    json_path = out_path + ".json" if not out_path.endswith(".json") else out_path
    with open(json_path, "w") as f:
        json.dump(spec, f)
    return json_path
