"""Single-process oracle port of the reference's *decision functions*
(SURVEY.md §5.2 layer 1). Treated as golden by the test suite; the Spark
pipeline must reproduce its exact groups exactly and its similar pairs
with recall >= 0.99."""
