from .losses import LaplacianLoss, FlattenLoss, neg_iou_loss
