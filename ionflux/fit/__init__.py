from ionflux.fit.train import fit_surface, pretrain, surface_loss, TrainResult

__all__ = ["fit_surface", "pretrain", "surface_loss", "TrainResult"]
