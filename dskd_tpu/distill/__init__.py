from .teacher import TeacherInfo, merge_teacher_gt, out_teacher  # noqa: F401
