"""Datamart models: the COL gap-closure pipeline and its driver-testdata
recast (SURVEY.md §2 / FIXTURES.md role mapping)."""
