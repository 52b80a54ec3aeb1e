"""The physics pipeline: broadphase -> narrowphase -> solver -> writeback.

Mirrors the stages of the reference's ``PhysicsSchedule``/``SubstepSchedule``
(SURVEY.md §3.1) as pure functions over the SoA world state.
"""
