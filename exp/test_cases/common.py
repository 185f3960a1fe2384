"""Shared runner for the test-case scripts (reference exp/test_cases/*).

Each script builds a model mirroring its reference namelist configuration and
runs chained monthly segments through the Experiment API. All scripts accept
--days/--months/--datadir/--resolution overrides.
"""

import argparse


def parse_args(default_resolution="T42", default_days=30):
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", default=default_resolution)
    p.add_argument("--levels", type=int, default=25)
    p.add_argument("--days", type=int, default=default_days)
    p.add_argument("--months", type=int, default=1)
    p.add_argument("--datadir", default="runs")
    return p.parse_args()


def default_diag(fields=("ucomp", "vcomp", "temp", "ps"), freq=86400):
    from isca_tpu.io.diag_manager import DiagTable

    dt = DiagTable().add_file("atmos_daily", freq)
    for f in fields:
        dt.add_field("atmos_daily", "dynamics", f, time_avg=True)
    return dt


def run(name, model, args, diag=None):
    from isca_tpu.experiment import Experiment

    exp = Experiment(name, model, diag or default_diag(), datadir=args.datadir)
    for i in range(1, args.months + 1):
        exp.run(i, days=args.days)
    return exp
