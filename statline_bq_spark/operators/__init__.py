"""Query-surface operators (SURVEY.md §2.B + §2.D), each a thin factory over
DataFrame/Catalyst plans designed to survive a 100× scale-up."""
