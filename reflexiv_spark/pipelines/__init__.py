"""Driver-side pipeline composition (SURVEY.md §2.9 I1-I4): the reference's
hard-coded Java stage chains become thin Python functions over DataFrame
operators, with ``localCheckpoint`` barriers instead of per-stage
SparkSession restarts."""
