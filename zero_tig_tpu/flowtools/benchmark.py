"""Flow-model speed/memory/FLOPs benchmark.

Parity: ptlflow_scripts/model_benchmark.py -- per-model inference time
(median over samples after a warmup discard), parameter count, FLOPs, and
device memory, written to CSV. TPU equivalents: ``jax.jit(...).lower()
.compile().cost_analysis()`` for FLOPs, device memory stats where the
backend exposes them, wall-clock with a forced device->host sync.
"""

from __future__ import annotations

import csv
import statistics
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .registry import available_models, get_flow_model


def _sync(out: Any) -> None:
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        float(jax.device_get(leaves[0].ravel()[0]))


def benchmark_model(
    name: str,
    *,
    height: int = 500,
    width: int = 1000,
    num_samples: int = 10,
    num_warmup: int = 2,
    iters: int | None = None,
    seed: int = 2,
) -> dict:
    """Benchmark one registered flow model at the reference operating point
    (500x1000 inputs, warmup-then-median protocol,
    model_benchmark.py:124-130, :316-335, :411-456)."""
    model = get_flow_model(name)
    iters = iters or model.default_iters
    key = jax.random.PRNGKey(seed)
    variables = model.init_fn(key)
    k1, k2 = jax.random.split(key)
    img1 = jax.random.uniform(k1, (1, height, width, 3), jnp.float32) * 255
    img2 = jax.random.uniform(k2, (1, height, width, 3), jnp.float32) * 255

    fwd = jax.jit(lambda v, a, b: model.forward_fn(v, a, b, iters))

    lowered = fwd.lower(variables, img1, img2)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", float("nan")))

    params = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(variables)
    )

    for _ in range(num_warmup):
        _sync(fwd(variables, img1, img2))
    times = []
    for _ in range(num_samples):
        t0 = time.time()
        _sync(fwd(variables, img1, img2))
        times.append(time.time() - t0)

    mem_stats = {}
    try:
        ms = jax.devices()[0].memory_stats()
        if ms:
            mem_stats = {"peak_bytes": ms.get("peak_bytes_in_use")}
    except Exception:
        pass

    return {
        "model": name,
        "input_h": height,
        "input_w": width,
        "iters": iters,
        "params": params,
        "flops": flops,
        "time_ms_median": statistics.median(times) * 1e3,
        "time_ms_mean": float(np.mean(times)) * 1e3,
        **mem_stats,
    }


def benchmark_all(csv_path: str | None = None, **kw) -> list[dict]:
    rows = []
    for name in available_models():
        try:
            rows.append(benchmark_model(name, **kw))
        except Exception as e:  # per-model skip-on-failure, like the sidecar
            print(f"[benchmark] {name} failed: {e}")
    if csv_path and rows:
        with open(csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=sorted(rows[0]))
            writer.writeheader()
            writer.writerows(rows)
    return rows


def plot_benchmark(
    rows: list[dict],
    out_path: str,
    *,
    accuracy: dict[str, float] | None = None,
    html_path: str | None = None,
) -> str:
    """Speed-vs-accuracy scatter from benchmark rows.

    Parity: the reference's plotly speed/accuracy HTML
    (ptlflow_scripts/model_benchmark.py:459-530). plotly is not in this
    image, so the artifact is a matplotlib PNG plus (optionally) a
    self-contained HTML page embedding it.

    accuracy: {model: EPE} from flowtools.validate runs; when absent the
    y axis falls back to parameter count (the other model-selection axis
    the reference plots). Identity is direct-labeled per point (single
    series, one hue -- no legend needed).
    """
    import base64

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = [r["time_ms_median"] for r in rows]
    if accuracy:
        ys = [accuracy.get(r["model"], float("nan")) for r in rows]
        ylabel = "EPE (px)"
    else:
        ys = [r["params"] / 1e6 for r in rows]
        ylabel = "parameters (M)"

    fig, ax = plt.subplots(figsize=(6.4, 4.2), facecolor="#fcfcfb")
    ax.set_facecolor("#fcfcfb")
    ax.scatter(xs, ys, s=60, color="#2a78d6", zorder=3)
    for r, x, y in zip(rows, xs, ys):
        ax.annotate(
            r["model"], (x, y), xytext=(6, 5), textcoords="offset points",
            fontsize=9, color="#52514e",
        )
    ax.set_xscale("log")
    ax.set_xlabel("inference time, median ms (log)", color="#0b0b0b")
    ax.set_ylabel(ylabel, color="#0b0b0b")
    ax.set_title(
        f"flow models @ {rows[0]['input_h']}x{rows[0]['input_w']}",
        color="#0b0b0b", fontsize=11,
    )
    ax.grid(True, color="#e6e5e1", linewidth=0.6, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c3c2b7")
    fig.tight_layout()
    fig.savefig(out_path, dpi=144)
    plt.close(fig)

    if html_path:
        with open(out_path, "rb") as f:
            b64 = base64.b64encode(f.read()).decode()
        table = "".join(
            "<tr>" + "".join(
                f"<td>{r.get(k, '')}</td>" for k in sorted(rows[0])
            ) + "</tr>"
            for r in rows
        )
        head = "".join(f"<th>{k}</th>" for k in sorted(rows[0]))
        with open(html_path, "w") as f:
            f.write(
                "<!doctype html><title>flow model benchmark</title>"
                "<body style='font-family:sans-serif;background:#fcfcfb'>"
                f"<img alt='speed vs accuracy scatter' "
                f"src='data:image/png;base64,{b64}'>"
                f"<table border=1 cellpadding=4 style='border-collapse:"
                f"collapse;color:#0b0b0b'><tr>{head}</tr>{table}</table>"
                "</body>"
            )
    return out_path


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("flow model benchmark")
    p.add_argument("--models", nargs="*", default=None)
    p.add_argument("--height", type=int, default=500)
    p.add_argument("--width", type=int, default=1000)
    p.add_argument("--num_samples", type=int, default=10)
    p.add_argument("--output_csv", type=str, default="flow_benchmark.csv")
    p.add_argument(
        "--plot", type=str, default="",
        help="write a speed-vs-params scatter PNG here (plus .html twin)",
    )
    args = p.parse_args(argv)
    names = args.models or available_models()
    rows = []
    for n in names:
        r = benchmark_model(
            n, height=args.height, width=args.width,
            num_samples=args.num_samples,
        )
        print(r)
        rows.append(r)
    with open(args.output_csv, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=sorted(rows[0]))
        writer.writeheader()
        writer.writerows(rows)
    if args.plot:
        html = (
            args.plot.rsplit(".", 1)[0] + ".html"
            if args.plot.endswith(".png") else args.plot + ".html"
        )
        plot_benchmark(rows, args.plot, html_path=html)


if __name__ == "__main__":
    main()
