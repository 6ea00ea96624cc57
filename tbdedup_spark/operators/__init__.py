"""Dataflow operators — each maps one or more reference operators (SURVEY.md
§2, O1-O25) onto Spark primitives. All are DataFrame -> DataFrame; shuffles
are documented per function."""
