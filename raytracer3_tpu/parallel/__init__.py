"""Multi-chip scaling: device-mesh sharding of the pixel grid / ray wavefront
over ICI — the first-class distributed layer the single-GPU reference lacks
(SURVEY.md §2.3, §5 'Distributed communication backend')."""
