"""Query plans: the reference's Q1/Q2 reports and the extension corpus."""
