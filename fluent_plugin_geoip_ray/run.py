"""Pipeline runner CLI — the ``fluentd -c fluent.conf`` analog.

Usage::

    python -m fluent_plugin_geoip_ray.run --input <parquet file/dir/glob...> \
        --out <out_dir> [--conf pipeline.json] [--num-cpus N] \
        [--partitioned] [--files-per-partition K] [--no-resume]

The conf file (JSON) mirrors the reference's fluentd config surface::

    {
      "filter": {                     # <filter> geoip section
        "geoip_lookup_keys": ["ip"],
        "backend_library": "geoip2_c",
        "record": {"city": "${city.names.en['ip']}", ...}
      },
      "routes": [                     # <match> fan-out (FIXTURES.md §4)
        {"name": "enriched", "match": "transcripts.**",
         "remove_tag_prefix": "transcripts.", "add_tag_prefix": "enriched.",
         "skip_adding_null_record": true, "sink": "enriched"},
        ...
      ]
    }

Defaults to the canonical spec/routes when ``--conf`` is omitted.  This is
the one module (besides bench.py and the test fixture) that owns a Ray
session, guarded by ``ray.is_initialized()``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def load_conf(path: str | None):
    from .conf import backend_spec_from_conf, record_spec_from_conf
    from .pipelines.flagship import canonical_record_spec
    from .stages.route import RouteSpec

    if path is None:
        return None, None, None, []
    with open(path) as f:
        conf = json.load(f)
    spec = (
        record_spec_from_conf(conf["filter"]) if "filter" in conf
        else canonical_record_spec()
    )
    backend_spec = backend_spec_from_conf(conf.get("filter", {}))
    routes = None
    if "routes" in conf:
        routes = [RouteSpec(**r) for r in conf["routes"]]
    stages = conf.get("stages") or []
    return spec, routes, backend_spec, stages


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="fluent_plugin_geoip_ray.run",
                                 description=__doc__.split("\n")[0])
    ap.add_argument("--input", required=True, nargs="+",
                    help="parquet file(s)/dir(s)/glob(s) of transcripts")
    ap.add_argument("--out", required=True, help="output directory (sinks, manifests)")
    ap.add_argument("--conf", default=None, help="pipeline conf JSON")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--partitioned", action="store_true",
                    help="resumable partitioned mode (lineage manifests)")
    ap.add_argument("--files-per-partition", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)

    inputs: list[str] = []
    for pat in args.input:
        if os.path.isdir(pat):
            inputs.extend(sorted(glob.glob(os.path.join(pat, "*.parquet"))))
        else:
            matched = sorted(glob.glob(pat))
            inputs.extend(matched if matched else [pat])
    if not inputs:
        print("no input files matched", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    spec, routes, backend_spec, stages = load_conf(args.conf)
    from .pipelines.flagship import canonical_routes, run_flagship, run_partitioned
    from .stages.route import RouteSpec

    if routes is not None:
        import dataclasses

        rebuilt = []
        for r in routes:
            kw = {f.name: getattr(r, f.name) for f in dataclasses.fields(RouteSpec)
                  if f.init}
            if kw.get("sink") and not os.path.isabs(kw["sink"]):
                kw["sink"] = os.path.join(args.out, kw["sink"])
            rebuilt.append(RouteSpec(**kw))
        routes = rebuilt
    else:
        routes = canonical_routes(args.out)

    if args.partitioned:
        result = run_partitioned(
            inputs, args.out, record_spec=spec, routes=routes,
            backend_spec=backend_spec, stages=stages,
            files_per_partition=args.files_per_partition,
            resume=not args.no_resume,
        )
        summary = {
            "ran_partitions": result["ran"],
            "skipped_partitions": result["skipped"],
        }
    else:
        stats = run_flagship(inputs, out_dir=args.out, record_spec=spec,
                             routes=routes, backend_spec=backend_spec,
                             stages=stages)
        rows = {
            r["route"]: r["n"]
            for r in stats.to_pylist()
            if r["kind"] == "rows"
        }
        summary = {"rows_out": rows}
    print(json.dumps({"ok": True, "out": args.out, **summary}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
