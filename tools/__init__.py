"""Measurement / test-support tooling (bench sidecars, plan audits,
randomized-fixture generation). Importable so tests and runners share
one implementation."""
