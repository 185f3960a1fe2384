"""Command-line front end: `python -m isca_tpu NAME [options]`.

Replaces the reference's `exp/run_isca/isca` CLI (argparse wrapper around
Experiment): pick a model variant, resolution and run length, chain monthly
segments with restarts, and write NetCDF diagnostics per run.
"""

from __future__ import annotations

import argparse
import sys


MODELS = ("held_suarez", "frierson", "barotropic", "shallow", "giant",
          "column")


def build_model(args):
    import dataclasses

    if args.model == "held_suarez":
        from isca_tpu.dycore.primitive import PrimitiveConfig
        from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel
        core = PrimitiveConfig(resolution=args.resolution,
                               num_levels=args.levels, dt=args.dt)
        return HeldSuarezModel(HeldSuarezConfig(core=core))
    if args.model == "frierson":
        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
        cfg = GreyMoistConfig()
        cfg = dataclasses.replace(cfg, core=dataclasses.replace(
            cfg.core, resolution=args.resolution, num_levels=args.levels,
            dt=args.dt))
        return GreyMoistModel(cfg)
    if args.model == "giant":
        from isca_tpu.models.giant import giant_planet_model
        return giant_planet_model(resolution=args.resolution,
                                  num_levels=args.levels, dt=args.dt)
    if args.model == "barotropic":
        from isca_tpu.models.barotropic import (BarotropicConfig,
                                                BarotropicModel)
        return BarotropicModel(BarotropicConfig(
            resolution=args.resolution, dt=args.dt))
    if args.model == "shallow":
        from isca_tpu.models.shallow import ShallowConfig, ShallowModel
        return ShallowModel(ShallowConfig(resolution=args.resolution,
                                          dt=args.dt))
    if args.model == "column":
        from isca_tpu.models.column import ColumnConfig, ColumnModel
        return ColumnModel(ColumnConfig(num_levels=args.levels, dt=args.dt))
    raise SystemExit(f"unknown model {args.model!r}")


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="isca_tpu",
        description="Run an isca_tpu experiment (exp/run_isca/isca parity)")
    p.add_argument("name", help="experiment name (output directory)")
    p.add_argument("--model", choices=MODELS, default="held_suarez")
    p.add_argument("--resolution", default="T42")
    p.add_argument("--levels", type=int, default=25)
    p.add_argument("--dt", type=float, default=600.0)
    p.add_argument("--days", type=int, default=30,
                   help="days per run segment")
    p.add_argument("-n", "--runs", type=int, default=1,
                   help="number of chained run segments")
    p.add_argument("--start", type=int, default=1,
                   help="first segment index (restart from start-1)")
    p.add_argument("--datadir", default="runs")
    p.add_argument("--daily", action="store_true",
                   help="daily instead of monthly-mean output")
    args = p.parse_args(argv)

    from isca_tpu.experiment import Experiment
    from isca_tpu.io.diag_manager import DiagTable

    model = build_model(args)
    dt_tab = DiagTable()
    freq = 86400 if args.daily else args.days * 86400
    fname = "atmos_daily" if args.daily else "atmos_monthly"
    dt_tab.add_file(fname, freq)
    if args.model == "barotropic":
        fields = ("ucomp", "vcomp", "vor")
    elif args.model == "shallow":
        fields = ("ucomp", "vcomp", "vor", "h")
    else:
        fields = ("ucomp", "vcomp", "temp", "ps")
    for field in fields:
        dt_tab.add_field(fname, "dynamics", field, time_avg=True)

    exp = Experiment(args.name, model, dt_tab, datadir=args.datadir)
    for i in range(args.start, args.start + args.runs):
        print(f"[isca_tpu] {args.name}: run {i} ({args.days} days)")
        exp.run(i, days=args.days)
    print(f"[isca_tpu] done -> {args.datadir}/{args.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
