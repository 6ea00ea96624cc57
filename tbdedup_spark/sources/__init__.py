"""Table sources & sinks: the run catalog (lineage/metrics/resume) and
testdata loaders."""
