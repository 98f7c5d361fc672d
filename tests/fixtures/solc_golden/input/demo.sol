// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

// café note — byte offsets ≠ char offsets past this comment, so a
// slicer confusing the two shifts every later slice

interface IVault {
    function deposit(uint256 amount) external;
}

contract Base {
    uint256 public stock;

    function restock(uint256 n) public {
        stock += n;
    }

    function audit(address who, uint256[] memory lots)
        public
        pure
        returns (bool)
    {
        return who != address(0) && lots.length > 0;
    }
}

contract Vault is Base, IVault {
    mapping(address => uint256) public balances;

    function deposit(uint256 amount) external {
        balances[msg.sender] += amount;
    }

    function deposit(uint256 amount, address onBehalfOf) public {
        balances[onBehalfOf] += amount;
    }

    function sweep() internal {
        stock = 0;
    }
}
