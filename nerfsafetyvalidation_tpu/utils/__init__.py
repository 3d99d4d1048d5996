from .seeding import seed_everything, KeyChain
