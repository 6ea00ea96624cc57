"""Stage orchestration: the end-to-end pipeline and its resume logic."""
