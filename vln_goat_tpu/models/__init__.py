from .goat import GoatModel
