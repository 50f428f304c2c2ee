"""Declared query set (SURVEY.md §2.11): NEXMark q0–q13, YSB, TPC-H subset,
window-operator queries, plus core relational-operator coverage."""
