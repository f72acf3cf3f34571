"""Domain layer: the reference's five clinical ETL pipelines re-expressed
as DataFrame-in → DataFrame-out compositions of the generic operator
layer (SURVEY.md §7.1 layer b).

- :mod:`schemas` — explicit StructTypes for the FHIR resource tables and
  terminology dimensions (FIXTURES.md §A).
- :mod:`fixtures` — deterministic in-memory fixture tables mirroring the
  reference's committed artifacts.
- :mod:`pipelines` — task 1-5 equivalents (clean/enrich/build/encode).

Golden parity: tests/test_fhir_golden.py replays the pipelines over the
fixtures and compares the produced resources against the reference's
committed outputs at /root/reference/src/data/*.
"""
