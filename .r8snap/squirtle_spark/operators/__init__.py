"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing. First-class deliverables beyond the reference's
own surface (SURVEY.md §7 step 9)."""
