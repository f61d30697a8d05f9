"""Engine operators, grouped by family (SURVEY.md §2).

Everything is expressed against the DataFrame API so Catalyst owns the
physical plan; no RDDs, no driver-side loops. Pandas UDFs appear only
where built-ins genuinely cannot express the semantics (multimodal
decode stubs).
"""
