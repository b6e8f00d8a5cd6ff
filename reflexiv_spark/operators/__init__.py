"""DataFrame operators re-expressing the reference pipeline stages
(SURVEY.md §2): counter (A1), fork filter (A5/W1/W2), RDK extension (J1/W3),
multi-k reduction (J2/W4), dedup (A3/J7/W7), merger (W8), mercy (W5/J5),
patching (J3/J4/W6).
"""
