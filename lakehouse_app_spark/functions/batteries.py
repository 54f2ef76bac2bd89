"""(filled in a later milestone)"""
