"""Scalar Column builders: strings/dates (reference F1-F21), text analysis,
vector math. All JVM-side built-in expressions — no row-at-a-time Python
(SURVEY.md §2.11 design rule)."""
