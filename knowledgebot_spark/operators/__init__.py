"""Operator library: every SURVEY.md §2 operator as a composable
DataFrame -> DataFrame function (declarative, Catalyst-optimizable)."""
