"""Experiment drivers and figures (reference L4 — SURVEY §2.14-2.19).

Each module pairs a dataframe builder (results → pandas CSV) with a figure
function (CSV → seaborn/matplotlib PNG), mirroring the reference's
script-per-figure layer but importable and testable.
"""
