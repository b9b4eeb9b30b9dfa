"""Pipeline assemblies re-expressing the reference's three phases
(SURVEY §3): per-PSet table builds (E1), the combine phase (E2), and
enrichment (E3) — as compositions of the operator library, all lazy
DataFrame transforms."""
