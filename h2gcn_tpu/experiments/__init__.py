"""Experiment pipeline: synthetic graph generation, feature transplant,
split generation, graph statistics, sweep orchestration, summarization.

The TPU-framework counterpart of the reference's signac-flow pipeline
(reference: experiments/h2gcn/, SURVEY.md components #15-#24), rebuilt on the
built-in run store with the same graph → features → splits → models
workspace hierarchy and content-hashed, resumable run identity.
"""
