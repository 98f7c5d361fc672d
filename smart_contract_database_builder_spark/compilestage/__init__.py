"""Compile & function-extraction stage (SURVEY.md U1-U3, F5, F6, F14)."""
