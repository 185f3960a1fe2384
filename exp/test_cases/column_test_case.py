"""Single-column model (exp/test_cases/column_test_case): physics without
the spectral dynamical core."""
from common import default_diag, parse_args, run

from isca_tpu.models.column import ColumnConfig, ColumnModel

args = parse_args()
model = ColumnModel(ColumnConfig(num_levels=args.levels))
run("column", model, args, diag=default_diag(fields=("temp",)))
