"""Column-level building blocks (pure pyspark.sql.functions expressions and
Arrow-vectorized pandas UDFs). Everything here returns Columns or DataFrames —
no actions, no driver-side data."""
