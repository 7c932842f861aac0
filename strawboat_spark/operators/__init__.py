"""Relational operators Spark lacks as built-ins, expressed as
DataFrame -> DataFrame compositions (SURVEY.md §2C custom rows).
"""
