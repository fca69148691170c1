"""(populated incrementally — see SURVEY.md §8.2 build order)"""
