# The fork repointed this file at the author's Apple Branch data (absolute
# path, 2-class PascalVOCDataset — SURVEY §0.4). Our portable version of the
# same contract lives in apple_branch.py; this alias keeps reference config
# names resolvable.
_base_ = './apple_branch.py'
